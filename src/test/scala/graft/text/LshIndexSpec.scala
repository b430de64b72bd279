package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables

class LshIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs = Tables.documents(spark, TestSpark.Sf0001)
    .select(col("doc_id"), col("text"))

  private val Key = Seq("lsh-index-spec", "sf0.001", 3, 24, 12, 2)

  test("index persists: built once, reloaded from disk, invalidate rebuilds") {
    LshIndex.invalidate(spark, Key)
    val idx1 = LshIndex.ensureIndex(spark, docs, Key)
    val n1 = idx1.count()
    assert(n1 > 0)
    val dir = graft.util.ArtifactStore.artifactDir(spark, "lsh_index", Key)
    val mtime = new java.io.File(dir, "_SUCCESS").lastModified()
    // second ensure must NOT rebuild (corpus arg is by-name: passing a
    // failing thunk proves it is never evaluated)
    val idx2 = LshIndex.ensureIndex(spark,
      { fail("index rebuilt despite persisted _SUCCESS"); docs }, Key)
    assert(idx2.count() === n1)
    assert(new java.io.File(dir, "_SUCCESS").lastModified() === mtime)
    LshIndex.invalidate(spark, Key)
    assert(!new java.io.File(dir, "_SUCCESS").exists())
  }

  test("incremental append: probe(appended index) == probe(rebuilt index)") {
    val key = Seq("lsh-index-spec-append", "sf0.001", 3, 24, 12, 2)
    LshIndex.invalidate(spark, key)
    val corpusA = docs.filter(col("doc_id") % 3 === 0)
    val batchB = docs.filter(col("doc_id") % 3 === 1)
    val probeC = docs.filter(col("doc_id") % 3 === 2)
      .unionByName(batchB.limit(15)
        .select((col("doc_id") + 700000L).as("doc_id"),
          concat(col("text"), lit(" qq")).as("text")))
    val fullCorpus = corpusA.unionByName(batchB)
    // lifecycle: build on A, ingest B, append B's keys
    LshIndex.ensureIndex(spark, corpusA, key)
    LshIndex.appendToIndex(spark, batchB, key)
    val appended = spark.read.parquet(
      graft.util.ArtifactStore.artifactDir(spark, "lsh_index", key).getAbsolutePath)
    val viaAppended = LshIndex.probeNearDups(probeC, fullCorpus, appended, 0.8)
      .collect().map(_.getLong(0)).toSet
    val viaRebuilt = LshIndex.probeNearDups(probeC, fullCorpus,
        LshIndex.bandKeys(fullCorpus), 0.8)
      .collect().map(_.getLong(0)).toSet
    assert(viaAppended === viaRebuilt)
    assert(viaAppended.nonEmpty, "planted near-dups of batch B must be caught")
    // replayed append (crash-retry) changes nothing: dup candidates collapse
    LshIndex.appendToIndex(spark, batchB, key)
    val replayed = LshIndex.probeNearDups(probeC, fullCorpus,
        spark.read.parquet(graft.util.ArtifactStore
          .artifactDir(spark, "lsh_index", key).getAbsolutePath), 0.8)
      .collect().map(_.getLong(0)).toSet
    assert(replayed === viaRebuilt)
    LshIndex.invalidate(spark, key)
  }

  test("probing the persisted index equals probing fresh band keys") {
    LshIndex.invalidate(spark, Key)
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
      .unionByName(corpus.limit(20)
        .select((col("doc_id") + 500000L).as("doc_id"),
          concat(col("text"), lit(" qq")).as("text")))
    val key = Seq("lsh-index-spec-probe", "sf0.001", 3, 24, 12, 2)
    LshIndex.invalidate(spark, key)
    val persisted = LshIndex.ensureIndex(spark, corpus, key)
    val fresh = LshIndex.bandKeys(corpus)
    val viaPersisted = LshIndex.probeNearDups(batch, corpus, persisted, 0.8)
      .collect().map(_.getLong(0)).toSet
    val viaFresh = LshIndex.probeNearDups(batch, corpus, fresh, 0.8)
      .collect().map(_.getLong(0)).toSet
    assert(viaPersisted === viaFresh)
    assert(viaPersisted.nonEmpty, "planted near-dups must be caught")
    LshIndex.invalidate(spark, key)
  }
}
