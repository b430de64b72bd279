package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1 stand-in: the reference's scraper pulls OHLCV bars from Yahoo Finance
  * (ref `scraper/scraper_upload.py:35`) — an external network source. This
  * generator plays that role deterministically: daily bars for a ticker,
  * produced by PURE EXPRESSIONS over `spark.range`, so any SQL engine can
  * reproduce the exact values (the DuckDB oracle does) and tests never
  * depend on the network.
  *
  * Generation: `h` = portable 31-bit rolling hash of the ticker;
  * `v(d) = (h * (d+1)) mod 997`; close = 100 + v/10; volume = 1000 +
  * (h*(d+1)) mod 9973. Integer arithmetic stays far below 2^63 (ANSI-safe).
  */
object SyntheticBars {

  /** Portable ticker hash — same value `TextOps.rollingHashExpr` computes
    * in SQL: fold (acc*31 + codepoint) mod (2^31-1).
    */
  def tickerHash(ticker: String): Long =
    ticker.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 2147483647L)

  /** `days` daily bars for `ticker` starting at `startDate` (yyyy-MM-dd),
    * in the raw-bar schema (`BatchPipeline.rawSchema`).
    */
  def bars(spark: SparkSession, ticker: String, startDate: String,
           days: Int): DataFrame = {
    val h = tickerHash(ticker)
    val ativo = ticker.split("\\.", -1)(0) // F2: "VALE3.SA" → "VALE3"
    spark.range(days.toLong)
      .select(
        col("id"),
        ((lit(h) * (col("id") + 1)) % 997L).as("__v"),
        ((lit(h) * (col("id") + 1)) % 9973L).as("__w"))
      .select(
        date_add(lit(startDate).cast("date"), col("id").cast("int"))
          .cast("timestamp").as("Date"),
        (lit(100.0) + ((lit(h) * col("id")) % 997L) / 10.0).as("Open"),
        (lit(101.0) + col("__v") / 10.0).as("High"),
        (lit(99.0) + col("__v") / 10.0).as("Low"),
        (lit(100.0) + col("__v") / 10.0).as("Close"),
        (lit(1000L) + col("__w")).as("Volume"),
        lit(ativo).as("ativo"))
  }

  /** The reference scraper's whole job (S1+S4): fetch → land in raw/. */
  def scrapeToRaw(spark: SparkSession, ticker: String, startDate: String,
                  days: Int, rawDir: String): Unit =
    graft.pipeline.BatchPipeline.writeRaw(
      bars(spark, ticker, startDate, days), rawDir)
}
