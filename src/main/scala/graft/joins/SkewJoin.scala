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

  /** @param big        the large (skewed) side; all columns preserved
    * @param small      the dimension side, replicated `salts` times
    * @param keys       equi-join key columns present on both sides
    * @param salts      sub-partitions per key (parallelism multiplier for
    *                   the hottest key)
    * @param joinType   inner / left (semantics identical to the plain join)
    * @param entropyCols big-side columns hashed (with the keys) into the
    *                   per-row salt. Default: every column — always
    *                   spreads, but a wide fact table then pays a hash of
    *                   the full row per row (VERDICT r3 #7); name one or
    *                   two high-entropy columns (a row id, a timestamp)
    *                   for the same spread at a fraction of the cost.
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                     salts: Int, joinType: String = "inner",
                     entropyCols: Seq[String] = Nil): DataFrame = {
    require(salts > 0, "salts must be positive")
    // deterministic per-row salt from (keys ++ entropy columns): no
    // rand(), so retries/re-runs route identically and results stay
    // reproducible. Keys participate so two hot keys with equal entropy
    // values still land on different salt sequences.
    val saltInput = if (entropyCols.nonEmpty) keys ++ entropyCols
                    else big.columns.toSeq
    val b = big.withColumn("__salt",
      pmod(xxhash64(saltInput.map(col): _*), lit(salts.toLong)).cast("int"))
    val sm = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(sm, keys :+ "__salt", joinType).drop("__salt")
  }
}
