package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables

case class RDoc(docId: Long, lang: String)

class StreamingRebalanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("stream admits exactly the batch rebalance's kept set") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val docs = Tables.documents(spark, sf)
    val batchKept = graft.SparkEntry.queries("x53_mixture_rebalance")(spark, sf)
      .select("doc_id").as[Long].collect().toSet

    val rates = StreamingRebalance.keepRates(docs, "lang")
    val sample = docs.select(col("doc_id"), col("lang"))
      .as[(Long, String)].collect()
    val input = MemoryStream[RDoc]
    val out = StreamingRebalance.keep(
      input.toDF().withColumnRenamed("docId", "doc_id"), "doc_id", "lang", rates)
    val q = out.writeStream.format("memory").queryName("srebal_out")
      .outputMode("append").start()
    try {
      input.addData(sample.map { case (id, l) => RDoc(id, l) }.toIndexedSeq: _*)
      q.processAllAvailable()
      val got = spark.table("srebal_out").select("doc_id").as[Long]
        .collect().toSet
      assert(got === batchKept,
        s"stream/batch keep sets differ: only-stream=${(got -- batchKept).take(5)} " +
          s"only-batch=${(batchKept -- got).take(5)}")
    } finally q.stop()
  }

  test("the keep plan is stateless: no state store operator") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val rates = StreamingRebalance.keepRates(
      Tables.documents(spark, sf), "lang")
    val input = MemoryStream[RDoc]
    val out = StreamingRebalance.keep(
      input.toDF().withColumnRenamed("docId", "doc_id"), "doc_id", "lang", rates)
    val q = out.writeStream.format("memory").queryName("srebal_plan")
      .outputMode("append").start()
    try {
      input.addData(RDoc(1L, "en"))
      q.processAllAvailable()
      val p = q.lastProgress
      assert(p.stateOperators.isEmpty,
        s"stateless filter acquired state operators: ${p.stateOperators.mkString}")
    } finally q.stop()
  }

  test("an unseen stratum is dropped, not admitted unthrottled") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val rates = StreamingRebalance.keepRates(
      Tables.documents(spark, sf), "lang")
    val input = MemoryStream[RDoc]
    val out = StreamingRebalance.keep(
      input.toDF().withColumnRenamed("docId", "doc_id"), "doc_id", "lang", rates)
    val q = out.writeStream.format("memory").queryName("srebal_unseen")
      .outputMode("append").start()
    try {
      input.addData((1L to 50L).map(i => RDoc(i, "xx")): _*)
      q.processAllAvailable()
      assert(spark.table("srebal_unseen").count() === 0L)
    } finally q.stop()
  }
}
