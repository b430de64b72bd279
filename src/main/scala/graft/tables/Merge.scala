package graft.tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE INTO for a slowly-changing-dimension type-2 table — the lakehouse
  * upsert a versioned corpus/dimension store needs (the reference's users
  * re-crawl and re-land whole partitions instead; this is the incremental
  * path). A snapshot row is (key, payload, valid_from, valid_to,
  * is_current); a change batch is (key, payload, op ∈ upsert|delete),
  * applied at a single batch timestamp:
  *
  *  - upsert of an existing key with a different payload closes the
  *    current row (valid_to = batchTs) and opens a new current row,
  *  - an identical payload is a no-op (idempotent re-delivery),
  *  - delete closes without replacement,
  *  - upsert of an absent key inserts a new current row,
  *  - delete of an absent key is a no-op,
  *  - closed history rows pass through untouched.
  *
  * Scale shape: ONE full-outer equi-join between the current slice and the
  * change batch (key-hash shuffle; the typically-small batch broadcasts
  * under size-based planning), then the 0–2 output rows per matched key
  * are produced by a row-local `explode` of a conditional struct array —
  * no second join, no union-diamond re-computation of the join
  * (`MergeSpec` pins one join + one generate). History never enters the
  * join: it unions straight from the scan, so a 100 TB history tail costs
  * a scan, not a shuffle.
  */
object Merge {

  /** Apply `changes` (key, payload, op) to `snapshot` at `batchTs`,
    * returning the full new SCD2 snapshot. Column names are fixed by the
    * SCD2 contract: `valid_from`, `valid_to`, `is_current`, `op`.
    */
  def applyScd2(snapshot: DataFrame, changes: DataFrame, key: String,
                payload: String, batchTs: Column): DataFrame = {
    val hist = snapshot.filter(!col("is_current"))
    val cur = snapshot.filter(col("is_current"))

    def row(p: Column, vf: Column, vt: Column, isCur: Column): Column =
      struct(p.as("p"), vf.as("vf"), vt.as("vt"), isCur.as("cur"))

    val nullTs = lit(null).cast("timestamp")
    val closedCur = row(col("__cur_p"), col("__cur_from"), batchTs, lit(false))
    val keptCur = row(col("__cur_p"), col("__cur_from"), nullTs, lit(true))
    val newCur = row(col("__chg_p"), batchTs, nullTs, lit(true))
    val emptyRows = array().cast("array<struct<p:string,vf:timestamp,vt:timestamp,cur:boolean>>")

    val joined = cur
      .select(col(key), col(payload).as("__cur_p"),
        col("valid_from").as("__cur_from"), lit(true).as("__in_cur"))
      .join(
        changes.select(col(key), col(payload).as("__chg_p"), col("op"),
          lit(true).as("__in_chg")),
        Seq(key), "full_outer")

    val merged = joined
      .select(col(key),
        explode(
          when(col("__in_chg").isNull, array(keptCur))
            .when(col("__in_cur").isNull && col("op") === "upsert", array(newCur))
            .when(col("__in_cur").isNull, emptyRows)
            .when(col("op") === "delete", array(closedCur))
            .when(col("__chg_p") <=> col("__cur_p"), array(keptCur))
            .otherwise(array(closedCur, newCur))).as("__r"))
      .select(col(key), col("__r.p").as(payload),
        col("__r.vf").as("valid_from"), col("__r.vt").as("valid_to"),
        col("__r.cur").as("is_current"))

    hist
      .select(col(key), col(payload), col("valid_from"), col("valid_to"),
        col("is_current"))
      .unionByName(merged)
  }
}
