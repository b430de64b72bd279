package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.SyntheticBars

/** THE market panel: single source of truth for the ticker sets, the
  * integer-cents daily close/volume panel, and their DuckDB replays
  * shared by the whole x73–x90 market-analytics suite. Cross-query pins
  * (e.g. `R8eOpsSpec`'s x90-vs-x75/x76/x85 agreement) rely on every
  * query deriving from the IDENTICAL panel — any change to the ticker
  * set, start date, bar count, or cents rounding must happen here and
  * nowhere else.
  */
private[graft] object MarketPanel {

  val StartDate = "2024-01-01"
  val Days = 120

  /** The 2-asset pair the x73–x77/x83/x85/x90 suite runs on. */
  val tickers2: Seq[String] = Seq("VALE3.SA", "PETR4.SA")

  /** The 3-asset cross-section x78's equal-weight index needs. */
  val tickers3: Seq[String] = tickers2 :+ "ITUB4.SA"

  /** Daily (ativo, dt, cents, vol) panel in exact integer cents. */
  def barsPanel(s: SparkSession, tickers: Seq[String]): DataFrame =
    tickers.map(t => SyntheticBars.bars(s, t, StartDate, Days))
      .reduce(_ unionByName _)
      .select(col("ativo"), col("Date").as("dt"),
        expr("CAST(round(Close * 100) AS BIGINT)").as("cents"),
        col("Volume").as("vol"))

  /** [[barsPanel]] without the volume column. */
  def centsPanel(s: SparkSession, tickers: Seq[String]): DataFrame =
    barsPanel(s, tickers).drop("vol")

  /** Full OHLC panel in exact integer cents
    * (ativo, dt, o/h/l/c_cents, vol). */
  def fullBarsPanel(s: SparkSession, tickers: Seq[String]): DataFrame =
    tickers.map(t => SyntheticBars.bars(s, t, StartDate, Days))
      .reduce(_ unionByName _)
      .select(col("ativo"), col("Date").as("dt"),
        expr("CAST(round(Open * 100) AS BIGINT)").as("o_cents"),
        expr("CAST(round(High * 100) AS BIGINT)").as("h_cents"),
        expr("CAST(round(Low * 100) AS BIGINT)").as("l_cents"),
        expr("CAST(round(Close * 100) AS BIGINT)").as("c_cents"),
        col("Volume").as("vol"))

  /** DuckDB replay of the union'd raw bars for `tickers`. */
  def barsGenSql(tickers: Seq[String]): String =
    tickers.map(SparkEntryPipeline.barsGenSql).mkString("\nUNION ALL\n")
}
