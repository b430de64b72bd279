package graft.text

import java.io.File

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.ArtifactStore

/** Persisted EXACT-membership index over a document corpus — the
  * exact-dedup analogue of [[LshIndex]] (VERDICT r6 #3): the corpus is
  * fingerprinted ONCE into a parquet side table of (bucket, fp, text)
  * rows, and every later "is this document already in the corpus" check
  * probes the INDEX. The corpus parquet is never re-read, let alone
  * re-shuffled, on the per-batch path.
  *
  * At 100 TB this is what makes the Bloom-pruned membership check
  * (x34) whole: the Bloom sketches prove most batch rows NEW map-side,
  * and the might-contain sliver's exact verify anti-joins this index on
  * (bucket, fp, text) — a precomputed, bucket-keyed table — instead of
  * dragging the full corpus text through the wire per batch. The text
  * column rides along so hash collisions cannot fake a membership hit
  * (hash routes, content decides — the x1b discipline); the ANSWER is
  * exact whatever the Bloom fpp.
  *
  * Same durable-artifact lifecycle as the IVF centroids / LSH band
  * index: built at most once per (corpus, params) with first-writer-wins
  * tmp+rename, survives a fresh JVM, `invalidate` on corpus rewrite.
  */
object MembershipIndex {

  /** (bucket, fp, text) rows for `docs`: fp = portable rolling hash of
    * the text, bucket = pmod(fp, numBuckets) — the same routing the
    * per-bucket Bloom sketches use, so probe and sketch agree on bucket
    * boundaries.
    */
  def fingerprints(docs: DataFrame, numBuckets: Int,
                   textCol: String = "text"): DataFrame = {
    val fp = TextOps.rollingHash(col(textCol))
    docs.select(
      pmod(fp, lit(numBuckets)).cast("int").as("bucket"),
      fp.as("fp"),
      col(textCol).as(textCol))
  }

  private def indexDir(spark: SparkSession, corpusKey: Seq[Any]): File =
    ArtifactStore.artifactDir(spark, "member_index", corpusKey)

  /** Load the persisted index for (corpus, params), building it once if
    * absent. `corpusKey` must identify the immutable corpus + params.
    */
  def ensureIndex(spark: SparkSession, corpus: => DataFrame, corpusKey: Seq[Any],
                  numBuckets: Int = 16, textCol: String = "text"): DataFrame = {
    val dir = indexDir(spark, corpusKey)
    if (!new File(dir, "_SUCCESS").exists()) {
      val tmp = new File(dir.getParentFile,
        dir.getName + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
      fingerprints(corpus, numBuckets, textCol)
        .write.mode(SaveMode.Overwrite).parquet(tmp.getAbsolutePath)
      ArtifactStore.publishDir(tmp, dir)
    }
    spark.read.parquet(dir.getAbsolutePath)
  }

  def invalidate(spark: SparkSession, corpusKey: Seq[Any]): Unit = {
    ArtifactStore.invalidate(spark, "member_index", corpusKey)
    ArtifactStore.invalidate(spark, "member_blooms", corpusKey)
  }

  /** Per-bucket Bloom sketches over the corpus fingerprints, persisted as
    * a `member_blooms` artifact (bucket → serialized filter blob, KBs
    * total): the broadcast-probe side of the x34 membership check. With
    * both this and the exact index persisted, the per-batch dedup plan
    * reads ONLY the batch and two tiny artifact tables — the corpus
    * parquet is not touched at all after the one-time build.
    *
    * `expectedItemsPerBucket`/`fpp` size each bucket's filter; like the
    * other index params, callers that vary them must embed them in
    * `corpusKey` (the artifact key is exactly `corpusKey`, so
    * `invalidate` clears it symmetrically).
    */
  def ensureBloomTable(spark: SparkSession, corpus: => DataFrame,
                       corpusKey: Seq[Any], numBuckets: Int = 16,
                       expectedItemsPerBucket: Long = 4096L,
                       fpp: Double = 0.01,
                       textCol: String = "text"): DataFrame = {
    import graft.expressions.BloomFilterAgg
    import org.apache.spark.sql.graft.ColumnBridge.{column => ccol, expression => cexp}
    val blobs = ArtifactStore.getOrCompute(spark, "member_blooms",
      corpusKey, ArtifactStore.BinaryMapCodec) {
      fingerprints(corpus, numBuckets, textCol)
        .groupBy(col("bucket"))
        .agg(ccol(BloomFilterAgg(cexp(col("fp")),
          expectedItemsPerBucket, fpp)).as("bf"))
        .collect().toSeq
        .map(r => (r.getInt(0).toString, r.getAs[Array[Byte]](1)))
    }
    // tiny driver-local frame (numBuckets rows of KB blobs) — exactly
    // the broadcast build side
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        blobs.map { case (b, bytes) =>
          org.apache.spark.sql.Row(b.toInt, bytes) }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("bucket",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("bf",
          org.apache.spark.sql.types.BinaryType, nullable = false))))
  }

  /** Post-commit maintenance: append an admitted batch's fingerprints so
    * the NEXT batch probes against them. Same idempotent-for-correctness
    * replay contract as `LshIndex.appendToIndex` — duplicate index rows
    * only produce duplicate anti-join keys, which change nothing.
    */
  def appendToIndex(spark: SparkSession, batch: DataFrame, corpusKey: Seq[Any],
                    numBuckets: Int = 16, textCol: String = "text"): Unit = {
    val dir = indexDir(spark, corpusKey)
    require(new File(dir, "_SUCCESS").exists(),
      s"no index at $dir — ensureIndex first")
    fingerprints(batch, numBuckets, textCol)
      .write.mode(SaveMode.Append).parquet(dir.getAbsolutePath)
  }
}
