package graft.tables

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SCD2 merge semantics on a planted scenario covering every branch, plus
  * the scale-shape pin: one equi-join, one generate, history never joined.
  */
class MergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2025-01-01 00:00:00")
  private val tH = Timestamp.valueOf("2024-01-01 00:00:00")
  private val tB = "2026-01-01 00:00:00"
  private val tBs = Timestamp.valueOf(tB).toString

  private def snapshot() = Seq(
    // key, payload, valid_from, valid_to, is_current
    (1L, "one-v1", t0, null.asInstanceOf[Timestamp], true),   // will update
    (2L, "two-v1", t0, null.asInstanceOf[Timestamp], true),   // no change
    (3L, "three-v1", t0, null.asInstanceOf[Timestamp], true), // delete
    (4L, "four-v1", t0, null.asInstanceOf[Timestamp], true),  // no-op upsert
    (1L, "one-v0", tH, t0, false)                             // closed history
  ).toDF("doc_id", "text", "valid_from", "valid_to", "is_current")

  private def changes() = Seq(
    (1L, "one-v2", "upsert"),                     // update
    (3L, null.asInstanceOf[String], "delete"),    // delete existing
    (4L, "four-v1", "upsert"),                    // idempotent re-delivery
    (5L, "five-v1", "upsert"),                    // insert new key
    (6L, null.asInstanceOf[String], "delete")     // delete absent key
  ).toDF("doc_id", "text", "op")

  private def merged() = Merge.applyScd2(snapshot(), changes(), "doc_id",
    "text", lit(tB).cast("timestamp"))

  test("every SCD2 branch lands in the expected state") {
    val out = merged().collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getTimestamp(3)).map(_.toString).orNull, r.getBoolean(4)))
      .toSet
    assert(out == Set(
      (1L, "one-v0", t0.toString, false),   // history untouched
      (1L, "one-v1", tBs, false),           // update: old row closed at batch ts
      (1L, "one-v2", null, true),           // update: new current row
      (2L, "two-v1", null, true),           // unmatched current kept open
      (3L, "three-v1", tBs, false),         // delete: closed, no replacement
      (4L, "four-v1", null, true),          // idempotent upsert: no-op
      (5L, "five-v1", null, true)           // insert
    ))
  }

  test("update keeps the original valid_from on the closed row; batch ts on the new") {
    val rows = merged().filter($"doc_id" === 1L && $"text" =!= "one-v0").collect()
    val closed = rows.find(!_.getBoolean(4)).get
    val opened = rows.find(_.getBoolean(4)).get
    assert(closed.getTimestamp(2) == t0 && closed.getTimestamp(3).toString == tBs)
    assert(opened.getTimestamp(2).toString == tBs && opened.getTimestamp(3) == null)
  }

  test("merge is idempotent: re-applying the same batch changes nothing") {
    val once = merged()
    val twice = Merge.applyScd2(once, changes(), "doc_id", "text",
      lit(tB).cast("timestamp"))
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("plan shape: one equi-join, one generate, history not joined") {
    val p = merged().queryExecution.executedPlan.toString
    val joins = p.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin") ||
        l.contains("ShuffledHashJoin"))
    assert(joins == 1, s"expected exactly one join, saw $joins")
    assert(p.linesIterator.count(_.contains("Generate explode")) == 1,
      "output rows must come from one row-local explode, not a union of join branches")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }
}
