package graft.joins

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join — the standard fix for a hot-key shuffle join when the
  * small side is too large (or the planner declines) to broadcast: a plain
  * equi-join hashes every row of a hot key into ONE reducer, so a key
  * holding 10% of 100 TB serializes 10 TB through a single task. Salting
  * splits each key's rows across `salts` sub-partitions (big side: a
  * deterministic per-row salt; small side: replicated once per salt) and
  * joins on (keys, salt) — the hot key now spreads over `salts` tasks at
  * the cost of `salts`× the small side's shuffle volume.
  *
  * Result is EXACTLY the plain equi-join: every big row carries one salt
  * value, and the small side is present under every salt, so the matched
  * multiset is unchanged (j7_salted_join shares j1's oracle). AQE's
  * skew-join handles the sort-merge case adaptively; this is the explicit,
  * planner-independent form that also covers aggregate-free pipelines.
  */
object SkewJoin {

  /** @param big      the large (skewed) side; all columns preserved
    * @param small    the dimension side, replicated `salts` times
    * @param keys     equi-join key columns present on both sides
    * @param salts    sub-partitions per key (parallelism multiplier for
    *                 the hottest key)
    * @param joinType inner / left (semantics identical to the plain join)
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                     salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // deterministic per-row salt from the row payload: no rand(), so
    // retries/re-runs route identically and results stay reproducible
    val b = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salts.toLong)).cast("int"))
    val sm = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(sm, keys :+ "__salt", joinType).drop("__salt")
  }
}
