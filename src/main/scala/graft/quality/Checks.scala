package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints evaluated as a violations report —
  * the contract gate a pipeline runs before publishing a table (the
  * reference publishes refined partitions consumed blind by SQL users;
  * this is the check that SHOULD sit in front of that publish).
  *
  * Evaluation cost model, by check class:
  *   - ALL row-local predicates fold into ONE scan + one aggregate row
  *     (conditional sums — adding a rule adds a column, never a pass);
  *   - each uniqueness check is one key-shuffle count (violations =
  *     surplus rows beyond the first per duplicated key);
  *   - each referential check is one left-anti join against the parent
  *     keys (broadcast when the parent key set fits — the common case for
  *     dimension parents).
  *
  * Output: (rule, violations) rows — empty-table and all-pass cases report
  * 0, never null. Rules that need columns from TWO tables (e.g. temporal
  * ordering across a join) run as row checks over the pre-joined frame;
  * `run` unions report frames, so composing per-frame reports is one
  * `unionByName`.
  */
object Checks {

  sealed trait Check { def name: String }

  /** Row-local predicate that is TRUE when the row VIOLATES the rule. */
  final case class RowCheck(name: String, violated: Column) extends Check

  /** Not-null shorthand. */
  def notNull(c: String): RowCheck = RowCheck(s"not_null_$c", col(c).isNull)

  /** Closed-range shorthand (violation = outside [lo, hi] or null). */
  def inRange(c: String, lo: Any, hi: Any): RowCheck =
    RowCheck(s"range_$c", !col(c).between(lit(lo), lit(hi)) || col(c).isNull)

  /** Key uniqueness: violations = Σ (group size − 1) over duplicated keys. */
  final case class Unique(name: String, cols: Seq[String]) extends Check

  /** Referential integrity: every `childKey` value must exist in
    * `parent.parentKey`. Null child keys are violations (they reference
    * nothing).
    */
  final case class RefIntegrity(name: String, childKey: String,
                                parent: DataFrame, parentKey: String) extends Check

  /** Evaluate `checks` against `df` → (rule, violations). An empty check
    * list yields an empty report, not an error.
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val rowChecks = checks.collect { case r: RowCheck => r }
    val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    if (rowChecks.nonEmpty) {
      // one scan: each rule is a conditional-sum column, then unpivot.
      // Aggregates alias as positional __c<i> and rule names enter ONLY
      // as escaped string literals — a name containing quotes/backticks
      // is data, never SQL structure.
      val agg = df.agg(
        sum(when(rowChecks.head.violated, 1L).otherwise(0L)).as("__c0"),
        rowChecks.tail.zipWithIndex.map { case (r, i) =>
          sum(when(r.violated, 1L).otherwise(0L)).as(s"__c${i + 1}") }: _*)
      val stackExpr = rowChecks.zipWithIndex.map { case (r, i) =>
        s"'${r.name.replace("\\", "\\\\").replace("'", "\\'")}', coalesce(__c$i, 0L)"
      }.mkString(s"stack(${rowChecks.size}, ", ", ", ") as (rule, violations)")
      frames += agg.selectExpr(stackExpr)
    }

    checks.foreach {
      case Unique(name, cols) =>
        frames += df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n"))
          .filter(col("__n") > 1)
          .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("violations"))
          .select(lit(name).as("rule"), col("violations"))
      case RefIntegrity(name, childKey, parent, parentKey) =>
        val missing = df.select(col(childKey))
          .join(parent.select(col(parentKey).as(childKey)).distinct(),
            Seq(childKey), "left_anti")
        frames += missing.agg(count(lit(1)).as("violations"))
          .select(lit(name).as("rule"), col("violations"))
      case _: RowCheck => () // folded above
    }
    if (frames.isEmpty)
      Seq.empty[(String, Long)].toDF("rule", "violations")
    else frames.reduce(_ unionByName _)
  }
}
