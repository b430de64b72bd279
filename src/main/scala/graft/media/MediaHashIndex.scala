package graft.media

import java.io.File

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.ArtifactStore

/** Persisted 64-bit perceptual-hash index over a media corpus — the
  * MEDIA analogue of `text/LshIndex`'s durable incremental-dedup
  * lifecycle: the corpus is decoded + hashed ONCE (dHash for images,
  * loudness-envelope hash for audio — both 8 bytes per item), the
  * (media_id, h) table lands as a parquet side table under the artifacts
  * root, and every later ingest batch decodes ONLY itself and probes the
  * index — the corpus binaries are never re-read.
  *
  * At 100 TB of media this is the difference between an O(batch) nightly
  * near-dup gate and an O(corpus) one: the index is 8 bytes + id per
  * item, the probe is the shared [[Hamming64]] band equi-join (recall
  * exact to Hamming distance 7 by pigeonhole), and every candidate is
  * verified by exact 64-bit Hamming distance, so false positives are
  * impossible. The modality lives entirely in the hash function — one
  * index module serves images, audio, and any future 64-bit content
  * hash.
  *
  * Crash/replay semantics mirror `LshIndex`: first-writer-wins publish
  * (tmp dir + rename), appends idempotent-for-correctness (duplicate
  * hash rows only produce duplicate candidates, collapsed before the
  * verify), `invalidate` for corpus rewrites.
  */
object MediaHashIndex {

  private def indexDir(spark: SparkSession, corpusKey: Seq[Any]): File =
    ArtifactStore.artifactDir(spark, "media_hash_index", corpusKey)

  /** Load the persisted (media_id, h) index for (corpus, params),
    * building it once if absent. `hashed` must be the corpus's
    * (id: long, h: long) hash table — e.g.
    * `ImageDedup`/`AudioDedup`-hashed binaries with undecodable rows
    * already dropped. `corpusKey` must identify the immutable corpus +
    * hash parameters. */
  def ensureIndex(spark: SparkSession, hashed: => DataFrame,
                  corpusKey: Seq[Any]): DataFrame = {
    val dir = indexDir(spark, corpusKey)
    if (!new File(dir, "_SUCCESS").exists()) {
      val tmp = new File(dir.getParentFile,
        dir.getName + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
      hashed.select(col("id"), col("h"))
        .write.mode(SaveMode.Overwrite).parquet(tmp.getAbsolutePath)
      ArtifactStore.publishDir(tmp, dir)
    }
    spark.read.parquet(dir.getAbsolutePath)
  }

  /** Append an ADMITTED batch's hashes — the post-commit maintenance
    * step of incremental ingest, one O(batch) parquet append. */
  def appendToIndex(spark: SparkSession, hashed: DataFrame,
                    corpusKey: Seq[Any]): Unit = {
    val dir = indexDir(spark, corpusKey)
    require(new File(dir, "_SUCCESS").exists(),
      s"no index at $dir — ensureIndex first")
    hashed.select(col("id"), col("h"))
      .write.mode(SaveMode.Append).parquet(dir.getAbsolutePath)
  }

  /** [[appendToIndex]] guarded by a `tag`-named marker file, so repeated
    * replays of the same batch append at most once — without it a
    * restart loop grows the persisted index without bound (duplicate
    * rows stay CORRECT per the duplicate-candidate contract, but the
    * artifact bloats). A crash between the part files and the marker
    * re-appends once on the next replay — bounded, still correct. */
  def appendToIndexOnce(spark: SparkSession, hashed: DataFrame,
                        corpusKey: Seq[Any], tag: String): Boolean = {
    val dir = indexDir(spark, corpusKey)
    val marker = new File(dir, s"_APPEND_$tag")
    if (marker.exists()) false
    else {
      appendToIndex(spark, hashed, corpusKey)
      marker.createNewFile()
    }
  }

  def invalidate(spark: SparkSession, corpusKey: Seq[Any]): Unit =
    rmRf(indexDir(spark, corpusKey))

  /** Batch ids whose hash lies within `maxDist` of some INDEXED hash:
    * band-bucket candidates between batch and index ([[Hamming64]]'s
    * bands, asymmetric), exact Hamming verify, duplicates collapsed.
    * O(batch) work against the KB/GB-scale index — the corpus binaries
    * are never touched. */
  def probeNearDups(batchHashed: DataFrame, index: DataFrame,
                    maxDist: Int = 6, maxBucketSize: Int = 1000): DataFrame = {
    require(maxDist <= 7,
      "8-bit bands guarantee recall only to Hamming distance 7")
    def banded(df: DataFrame, idAs: String, hAs: String): DataFrame = {
      val keyed = df.select(col("id").as(idAs), col("h").as(hAs),
        explode(expr(
          "transform(sequence(0, 7), b -> named_struct(" +
            "'band', b, 'bits', (h >> (b * 8)) & 255))")).as("bk"))
      // hot-bucket cap on the INDEX side only (degenerate corpus content);
      // every batch row must keep all its bands or recall breaks
      if (idAs == "__cid") {
        keyed
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("bk")).orderBy(col(idAs))))
          .where(col("rn") <= maxBucketSize)
          .drop("rn")
      } else keyed
    }
    banded(batchHashed, "__bid", "__bh")
      .join(banded(index, "__cid", "__ch"), Seq("bk"))
      .where(expr("bit_count(__bh ^ __ch)") <= maxDist)
      .select(col("__bid").as("id"))
      .distinct()
  }

  private def rmRf(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmRf))
    f.delete(); ()
  }
}
