package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.ZOrder
import graft.tables.Tables

/** Round-5d query entries: lakehouse data-layout operators — z-order
  * clustering with min/max file-skipping (`pipeline/ZOrder.scala`).
  *
  * The x20 entry exercises the full lifecycle: cluster a copy of `events`
  * on (user_id, value), build the per-file min/max index, serve a box
  * predicate through the index-pruned read, and re-apply the exact
  * predicate. Pruning is a pure optimization (conservative file skipping),
  * so the result is oracle-exact against a plain filtered scan — the same
  * contract a 100 TB reader gets: fewer files touched, identical rows.
  */
object SparkEntryR5d {

  private def tmpBase(sfDir: String, name: String): String = {
    val leaf = new java.io.File(sfDir).getName
    s"${System.getProperty("java.io.tmpdir")}/graft_r5d/$leaf/$name"
  }

  /** Box predicate fixed across scales: non-degenerate from sf0.001
    * (user_id 0-14) through sf0.1 (user_id 0-1499).
    */
  private val UserLo = 2L
  private val UserHi = 9L
  private val ValLo = 50.0
  private val ValHi = 150.0

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X20: z-order-clustered box scan — identical rows to a full filtered
    // scan (the oracle), served from index-selected files only. The
    // clustered copy + index are built once per (sf, tmp) and trusted via
    // _SUCCESS (ZOrderSpec pins pruning power and null/degenerate edges).
    "x20_zorder_prune" -> ((s, d) => {
      val dir = tmpBase(d, "events_z")
      ZOrder.clusterWrite(Tables.events(s, d), Seq("user_id", "value"),
        dir, numFiles = 16)
      ZOrder.prunedRead(s, dir, Seq(
        ("user_id", UserLo, UserHi), ("value", ValLo, ValHi)))
        .filter(col("user_id").between(UserLo, UserHi) &&
          col("value").between(ValLo, ValHi))
        .select(col("event_id"), col("user_id"), col("value"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "x20_zorder_prune" -> s"""
      SELECT event_id, user_id, value FROM events
      WHERE user_id BETWEEN $UserLo AND $UserHi
        AND value BETWEEN $ValLo AND $ValHi
      """
  )
}
