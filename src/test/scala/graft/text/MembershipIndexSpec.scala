package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables

/** Exact-membership index lifecycle (VERDICT r6 #3): corpus fingerprints
  * persist once; membership probes (and the per-bucket Bloom sketches)
  * come from the artifacts, never a corpus re-scan.
  */
class MembershipIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs = Tables.documents(spark, TestSpark.Sf0001)
    .select(col("doc_id"), col("text"))

  test("index persists: built once, reloaded from disk, invalidate rebuilds") {
    val key = Seq("member-index-spec", "sf0.001", 16)
    MembershipIndex.invalidate(spark, key)
    val idx1 = MembershipIndex.ensureIndex(spark, docs, key, 16)
    val n1 = idx1.count()
    assert(n1 === docs.count())
    val dir = graft.util.ArtifactStore.artifactDir(spark, "member_index", key)
    val mtime = new java.io.File(dir, "_SUCCESS").lastModified()
    val idx2 = MembershipIndex.ensureIndex(spark,
      { fail("index rebuilt despite persisted _SUCCESS"); docs }, key, 16)
    assert(idx2.count() === n1)
    assert(new java.io.File(dir, "_SUCCESS").lastModified() === mtime)
    MembershipIndex.invalidate(spark, key)
    assert(!new java.io.File(dir, "_SUCCESS").exists())
  }

  test("anti-join against the index equals anti-join against the corpus texts") {
    val key = Seq("member-index-spec-probe", "sf0.001", 16)
    MembershipIndex.invalidate(spark, key)
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    // batch = genuinely new docs + exact re-crawls of corpus texts
    val batch = docs.filter(col("doc_id") % 2 === 1)
      .unionByName(corpus.limit(20)
        .select((col("doc_id") + 500000L).as("doc_id"), col("text")))
    val idx = MembershipIndex.ensureIndex(spark, corpus, key, 16)
    val fp = TextOps.rollingHash(col("text"))
    val probed = batch
      .withColumn("fp", fp)
      .withColumn("bucket", pmod(col("fp"), lit(16)).cast("int"))
    val viaIndex = probed
      .join(idx, Seq("bucket", "fp", "text"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaCorpus = batch
      .join(corpus.select("text"), Seq("text"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaIndex === viaCorpus)
    assert(viaIndex.nonEmpty, "genuinely new docs must survive")
    assert(viaIndex.size < batch.count(), "re-crawled texts must be caught")
    MembershipIndex.invalidate(spark, key)
  }

  test("append admits a batch to the index; replayed append changes nothing") {
    val key = Seq("member-index-spec-append", "sf0.001", 16)
    MembershipIndex.invalidate(spark, key)
    val corpusA = docs.filter(col("doc_id") % 3 === 0)
    val batchB = docs.filter(col("doc_id") % 3 === 1)
    MembershipIndex.ensureIndex(spark, corpusA, key, 16)
    MembershipIndex.appendToIndex(spark, batchB, key, 16)
    def idxNow = spark.read.parquet(graft.util.ArtifactStore
      .artifactDir(spark, "member_index", key).getAbsolutePath)
    // a re-crawl of batch B now hits the appended index
    val recrawlB = batchB.limit(10)
      .select((col("doc_id") + 900000L).as("doc_id"), col("text"))
    val fp = TextOps.rollingHash(col("text"))
    def survivors = recrawlB
      .withColumn("fp", fp)
      .withColumn("bucket", pmod(col("fp"), lit(16)).cast("int"))
      .join(idxNow, Seq("bucket", "fp", "text"), "left_anti").count()
    assert(survivors === 0L, "appended batch's texts must be members")
    MembershipIndex.appendToIndex(spark, batchB, key, 16) // crash-retry replay
    assert(survivors === 0L)
    MembershipIndex.invalidate(spark, key)
  }

  test("bloom table persists as an artifact and preserves no-false-negatives") {
    val key = Seq("member-bloom-spec", "sf0.001", 16)
    MembershipIndex.invalidate(spark, key)
    val before = graft.util.ArtifactStore.fits
    val bt1 = MembershipIndex.ensureBloomTable(spark, docs, key, 16)
    assert(graft.util.ArtifactStore.fits === before + 1)
    assert(bt1.count() === 16)
    // second ensure: memory/disk hit, corpus thunk never evaluated
    MembershipIndex.ensureBloomTable(spark,
      { fail("bloom table refit despite artifact"); docs }, key, 16)
    assert(graft.util.ArtifactStore.fits === before + 1)
    // no false negatives: every corpus fingerprint reports present
    import org.apache.spark.sql.graft.ColumnBridge.{column => ccol, expression => cexp}
    import graft.expressions.BloomMightContain
    val missed = MembershipIndex.fingerprints(docs, 16)
      .join(broadcast(bt1), Seq("bucket"))
      .filter(!ccol(BloomMightContain(cexp(col("bf")), cexp(col("fp")))))
      .count()
    assert(missed === 0L)
    MembershipIndex.invalidate(spark, key)
  }
}
