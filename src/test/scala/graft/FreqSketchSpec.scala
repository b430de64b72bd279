package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Frequent-items sketch family: exact under capacity, merge == global,
  * heavy hitters never missed (NO_FALSE_NEGATIVES), bounds bracket truth.
  */
class FreqSketchSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    org.apache.spark.sql.graft.ColumnBridge.registerFunctions(s)
    s
  }
  import spark.implicits._

  // skewed corpus: "hot" 500×, "warm" 120×, 400 singletons
  private def items = (
    Seq.fill(500)("hot") ++ Seq.fill(120)("warm") ++
      (0 until 400).map(i => s"cold_$i")
  ).toDF("item")

  test("under capacity the sketch is exact and top-k order is deterministic") {
    items.createOrReplaceTempView("fi_items")
    val got = spark.sql("""
      SELECT inline(graft_freq_topk(graft_freq_agg(item, 2048), 2))
      FROM fi_items""").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(("hot", 500L, 500L, 500L),
      ("warm", 120L, 120L, 120L)))
  }

  test("per-batch sketches union to the global answer") {
    items.withColumn("batch", monotonically_increasing_id() % 7)
      .createOrReplaceTempView("fi_batches")
    val merged = spark.sql("""
      WITH per_batch AS (
        SELECT batch, graft_freq_agg(item, 2048) AS sk
        FROM fi_batches GROUP BY batch)
      SELECT inline(graft_freq_topk(graft_freq_union(sk, 2048), 2))
      FROM per_batch""").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(merged.toSeq === Seq(("hot", 500L), ("warm", 120L)))
  }

  test("over capacity: heavy hitters survive with bounds that bracket the truth") {
    items.createOrReplaceTempView("fi_items")
    // maxMapSize 64 << 402 distinct values — eviction is guaranteed
    val got = spark.sql("""
      SELECT inline(graft_freq_topk(graft_freq_agg(item, 64), 3))
      FROM fi_items""").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val hot = got.find(_._1 == "hot")
    val warm = got.find(_._1 == "warm")
    assert(hot.isDefined && warm.isDefined,
      s"true heavy hitters missed under eviction: ${got.toSeq}")
    assert(hot.get._3 <= 500L && 500L <= hot.get._4, s"hot bounds wrong: $hot")
    assert(warm.get._3 <= 120L && 120L <= warm.get._4, s"warm bounds wrong: $warm")
  }

  test("type errors are analysis-time failures") {
    items.createOrReplaceTempView("fi_items")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_freq_agg(CAST(1 AS INT), 64) FROM fi_items").collect()
    }
    assert(e.getMessage.contains("STRING"))
  }
}
