package graft.text

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.ArtifactStore

/** Shard-manifest lifecycle (x87/x87b): the verification artifact an
  * exactly-once shard writer publishes beside its files, and its
  * O(batch) incremental maintenance.
  *
  * Every manifest column merges exactly — doc counts and token sums
  * ADD, the content checksum is a bit-XOR (commutative, associative,
  * self-inverse, overflow-free) — so absorbing a batch into a persisted
  * manifest equals a full rebuild BIT-FOR-BIT (the x64b absorb==rebuild
  * discipline), and the corpus behind the old manifest is never
  * rescanned. Shard assignment reuses x50's salted content+id hash: a
  * manifest must describe exactly the shards the training shuffle
  * produces.
  */
object ShardManifest {

  /** x50's shard key: salted portable hash of content + id, mod 32. */
  def shardOf(text: Column, docId: Column): Column =
    pmod(TextOps.rollingHash(concat(lit("shuf1:"), text, lit(":"),
      docId.cast("string"))), lit(32L))

  /** Per-shard manifest of `docs` (`doc_id`, `text`): doc count,
    * whitespace token mass, XOR content checksum. One partial-aggregable
    * shuffle on the shard key; ≤32-row output.
    */
  def manifest(docs: DataFrame): DataFrame =
    docs
      .select(shardOf(col("text"), col("doc_id")).as("shard"),
        TextOps.tokenCount(col("text")).as("toks"),
        TextOps.rollingHash(col("text")).as("fp"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"),
        expr("bit_xor(fp)").as("checksum"))

  /** Compute-once persisted manifest for an immutable corpus slice. */
  def ensure(spark: SparkSession, docs: DataFrame, key: Seq[Any]): DataFrame = {
    val dir = ArtifactStore.artifactDir(spark, "shard_manifest", key)
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      val tmp = new java.io.File(dir.getParentFile,
        dir.getName + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
      manifest(docs).write.mode(SaveMode.Overwrite)
        .parquet(tmp.getAbsolutePath)
      ArtifactStore.publishDir(tmp, dir)
    }
    spark.read.parquet(dir.getAbsolutePath)
  }

  /** Fold `batch` into the manifest at `baseKey`, publishing the merged
    * manifest at `newKey` — O(batch) + O(32 shards); counts add,
    * checksums XOR. Returns the merged manifest.
    */
  def absorb(spark: SparkSession, batch: DataFrame,
             baseKey: Seq[Any], newKey: Seq[Any]): DataFrame = {
    val dir = ArtifactStore.artifactDir(spark, "shard_manifest", newKey)
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      val base = spark.read.parquet(
        ArtifactStore.artifactDir(spark, "shard_manifest", baseKey)
          .getAbsolutePath)
      val merged = base.unionByName(manifest(batch))
        .groupBy("shard")
        .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"),
          expr("bit_xor(checksum)").as("checksum"))
      val tmp = new java.io.File(dir.getParentFile,
        dir.getName + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
      merged.write.mode(SaveMode.Overwrite).parquet(tmp.getAbsolutePath)
      ArtifactStore.publishDir(tmp, dir)
    }
    spark.read.parquet(dir.getAbsolutePath)
  }
}
