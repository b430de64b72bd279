package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered running distinct-count per key —
  * `count(DISTINCT x) OVER (PARTITION BY k ORDER BY t)` — the cumulative
  * form of the x135 whole-partition attach ("distinct users to date per
  * key"). Spark's window surface rejects DISTINCT aggregates outright, so
  * the operator composes it from primitives (VERDICT r13 #2):
  *
  *  1. one `(k, x)` partial aggregate finds each value's FIRST row —
  *     `min_by(id, (t, id))`, so ties at the first timestamp break
  *     deterministically on the unique row id;
  *  2. a null-safe join marks exactly that row per `(k, x)` with a 0/1
  *     new-value flag (a value's later rows contribute nothing);
  *  3. a keyed running sum of the flag — `sum(flag) OVER (PARTITION BY k
  *     ORDER BY t)` with the default peer-inclusive RANGE frame — which
  *     the keyed-window rewrite family heals off `WindowExec` when the
  *     key's ndv is proven (w11's first-occurrence trick, keyed).
  *
  * RANGE semantics make the flag's placement among time-peers
  * irrelevant: peers aggregate together, so every row at time `t` sees
  * the distinct count including ALL values first seen at `t` — exactly
  * the engines' windowed-DISTINCT law (the x141 oracle runs the real
  * windowed DISTINCT in DuckDB against this composition). NULL `x`
  * never counts (DISTINCT ignores nulls) but its rows keep their running
  * value; a NULL key is its own partition, as in any window.
  *
  * Scale shape: the corpus is scanned once; the first-occurrence frame is
  * a partial-agg shuffle of size ndv(k, x); the flag attach is one
  * equi-join (AQE broadcasts it when small); the running sum is the
  * sequential component every cumulative operator owns, healed to the
  * range-partitioned keyed running exec. No all-pairs, no corpus sort
  * beyond the running frame's.
  *
  * For approximate cumulative cardinality at stream scale, the theta
  * sketch twin (x141b) buckets time and folds a running union of
  * mergeable sketches over the bounded (k, bucket) frame instead.
  */
object RunningDistinct {

  /** @param df  input rows
    * @param k   partition key column
    * @param t   ordering column (peers share the running value)
    * @param x   column whose distinct values are counted
    * @param id  unique non-null row id (deterministic tie-break for
    *            values first seen by several rows at the same `t`)
    * @param out name of the attached running distinct-count column
    */
  def attach(df: DataFrame, k: String, t: String, x: String, id: String,
             out: String): DataFrame = {
    val firsts = df
      .select(col(k).as("__rd_k"), col(x).as("__rd_x"),
        col(t).as("__rd_t"), col(id).as("__rd_id"))
      .groupBy("__rd_k", "__rd_x")
      .agg(min_by(col("__rd_id"), struct(col("__rd_t"), col("__rd_id")))
        .as("__rd_fid"))
    val flagged = df
      .join(firsts, col(k) <=> col("__rd_k") && col(x) <=> col("__rd_x"), "left")
      .withColumn("__rd_new",
        when(col(x).isNotNull && col(id) === col("__rd_fid"), 1L)
          .otherwise(0L))
      .drop("__rd_k", "__rd_x", "__rd_fid")
    val w = Window.partitionBy(col(k)).orderBy(col(t))
    flagged.withColumn(out, sum(col("__rd_new")).over(w)).drop("__rd_new")
  }
}
