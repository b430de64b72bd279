package graft.media

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables

/** The persisted media-hash index lifecycle (the x37 text discipline for
  * images/audio): build-once, O(batch) probe, append == rebuild,
  * invalidate — and the probe is modality-agnostic (the hash function is
  * the modality).
  */
class MediaHashIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs = Tables.documents(spark, graft.TestSpark.Sf0001).limit(120)

  test("probe flags exactly the planted near-dups; fresh content passes; audio reuses the module") {
    val media = ImageDedup.plantedCorpus(docs)
    val corpus = media.filter(col("media_id") % 10 =!= 1)
    val batch = media.filter(col("media_id") % 10 === 1)
    val key = Seq("mhix_spec", System.nanoTime())
    try {
      val idx = MediaHashIndex.ensureIndex(spark, ImageDedup.hashed(corpus), key)
      val flagged = MediaHashIndex.probeNearDups(ImageDedup.hashed(batch), idx)
        .collect().map(_.getLong(0)).toSet
      val expected = docs.select("doc_id").collect().map(_.getLong(0)).toSet
        .filter(_ % 10 == 1)
      assert(flagged === expected)
      // fresh distinct photos: none flag
      import spark.implicits._
      val fresh = spark.range(900000, 900040).as[Long].mapPartitions(_.map { id =>
        (id, ImageDedup.encodePng(32, 32, ImageDedup.syntheticRgb(id, 32, 32, 0)))
      }).toDF("media_id", "media")
      assert(MediaHashIndex.probeNearDups(ImageDedup.hashed(fresh), idx).count() === 0L)
      // the same module serves audio hashes unchanged
      val aCorpus = AudioDedup.plantedCorpus(docs).filter(col("media_id") % 10 =!= 1)
      val aBatch = AudioDedup.plantedCorpus(docs).filter(col("media_id") % 10 === 1)
      val aKey = Seq("mhix_spec_audio", System.nanoTime())
      try {
        val aIdx = MediaHashIndex.ensureIndex(spark, AudioDedup.hashed(aCorpus), aKey)
        val aFlagged = MediaHashIndex.probeNearDups(AudioDedup.hashed(aBatch), aIdx)
          .collect().map(_.getLong(0)).toSet
        assert(aFlagged === expected)
      } finally MediaHashIndex.invalidate(spark, aKey)
    } finally MediaHashIndex.invalidate(spark, key)
  }

  test("append == rebuild: an admitted batch's hashes extend the index exactly") {
    val media = ImageDedup.plantedCorpus(docs)
    val half1 = media.filter(col("media_id") % 10 < 5 && col("media_id") % 10 =!= 1)
    val half2 = media.filter(col("media_id") % 10 >= 5)
    val batch = media.filter(col("media_id") % 10 === 1)
    val keyApp = Seq("mhix_append", System.nanoTime())
    val keyAll = Seq("mhix_rebuild", System.nanoTime())
    try {
      MediaHashIndex.ensureIndex(spark, ImageDedup.hashed(half1), keyApp)
      MediaHashIndex.appendToIndex(spark, ImageDedup.hashed(half2), keyApp)
      val appended = MediaHashIndex.ensureIndex(spark,
        sys.error("must not rebuild"), keyApp)
      val rebuilt = MediaHashIndex.ensureIndex(spark,
        ImageDedup.hashed(half1.unionByName(half2)), keyAll)
      val viaAppend = MediaHashIndex.probeNearDups(ImageDedup.hashed(batch), appended)
        .collect().map(_.getLong(0)).toSet
      val viaRebuild = MediaHashIndex.probeNearDups(ImageDedup.hashed(batch), rebuilt)
        .collect().map(_.getLong(0)).toSet
      assert(viaAppend === viaRebuild)
      assert(appended.count() === rebuilt.count())
    } finally {
      MediaHashIndex.invalidate(spark, keyApp)
      MediaHashIndex.invalidate(spark, keyAll)
    }
  }

  test("invalidate forces a rebuild; ensure is first-writer-wins durable") {
    val media = ImageDedup.plantedCorpus(docs).limit(20)
    val key = Seq("mhix_lifecycle", System.nanoTime())
    try {
      val n1 = MediaHashIndex.ensureIndex(spark, ImageDedup.hashed(media), key).count()
      // second ensure must NOT evaluate the corpus again
      val n2 = MediaHashIndex.ensureIndex(spark,
        sys.error("must not rebuild"), key).count()
      assert(n1 === n2)
      MediaHashIndex.invalidate(spark, key)
      val n3 = MediaHashIndex.ensureIndex(spark, ImageDedup.hashed(media), key).count()
      assert(n3 === n1)
    } finally MediaHashIndex.invalidate(spark, key)
  }
}
