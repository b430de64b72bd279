package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.tables.Tables

/** Round-13 query entries. §2.12 extension operators. */
object SparkEntryR13 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- X131: HALF-unbounded value-distance frames — cumulative-with-
    // lookahead and remaining-mass through the plain SQL surface ----
    //
    // `UNBOUNDED PRECEDING AND Δ FOLLOWING` ("everything up to a little
    // past here" — calibration curves, cumulative coverage with slack)
    // and `Δ PRECEDING AND UNBOUNDED FOLLOWING` ("the mass from just
    // below here onward" — survival/remaining-budget views) are
    // user-writable SQL Spark plans as a one-task (resp. ndv-task)
    // sort-window (VERDICT r12 missing #3). `GlobalRankRule`/
    // `KeyedWindowRule` re-plan both through `RangeAggExec`: the
    // unbounded side rides PREFIX/SUFFIX SEEDS (per-partition segment
    // partials, driver-merged key-scoped along the partition chain — the
    // running exec's merge contract), the bounded side the usual staged
    // range harvest. The prefix form streams with Δ lag at any scale;
    // the suffix form's pending span is the key's row count, loudly
    // capped. Integer sums/counts → fold-order-independent, engine-
    // exact. The keyed ndv proof is the language IN filter;
    // `PlanAuditSpec` pins all four windows Window-free.
    // ---- X130: content-level VIDEO near-dup — the last metadata-deep
    // modality gets its signal path ----
    //
    // The x119/x126 discipline for footage: a pure-JVM uncompressed-DIB
    // RIFF/AVI codec (the planted-fixture discipline of the WAV/BMP
    // paths), per-frame rasters through ImageDedup's luma path, a 65-slot
    // brightness-envelope temporal difference hash (brightness shifts,
    // resolution upsamples and frame-rate resamples land at Hamming
    // distance 0), and the shared Hamming64 band join — recall exact to
    // distance 7 by pigeonhole, hot buckets capped, never all-pairs.
    // Constructor inversion: every planted near-dup is a re-master of
    // doc_id-1's clip (+6 brightness for even groups, 2x resolution +
    // 2x frame rate for odd), so the expected pair set is pure doc_id
    // arithmetic. At 100 TB decode+hash ride the scan row-locally; the
    // only exchange is the band-key equi-join.
    "x130_video_neardup" -> ((s, d) => {
      val media = graft.media.VideoDedup.plantedCorpus(Tables.documents(s, d))
      graft.media.VideoDedup.nearDupPairs(media)
        .orderBy("a", "b")
    }),

    "x131_half_unbounded" -> ((s, d) => {
      Tables.documents(s, d).createOrReplaceTempView("x131_documents")
      s.sql(
        """SELECT doc_id,
          |  sum(n_chars) OVER (ORDER BY n_chars
          |    RANGE BETWEEN UNBOUNDED PRECEDING AND 100 FOLLOWING)
          |    AS cum_look100,
          |  count(*) OVER (ORDER BY n_chars
          |    RANGE BETWEEN 50 PRECEDING AND UNBOUNDED FOLLOWING)
          |    AS mass_from50,
          |  sum(n_chars) OVER wk AS lang_mass_ahead,
          |  count(*) OVER wp AS lang_cum_look
          |FROM x131_documents
          |WHERE lang IN ('de', 'en', 'es', 'fr', 'zh')
          |WINDOW wk AS (PARTITION BY lang ORDER BY n_chars
          |    RANGE BETWEEN 50 PRECEDING AND UNBOUNDED FOLLOWING),
          |  wp AS (PARTITION BY lang ORDER BY n_chars
          |    RANGE BETWEEN UNBOUNDED PRECEDING AND 100 FOLLOWING)
          |ORDER BY doc_id""".stripMargin)
    }))

  def oracleSql: Map[String, String] = Map(
    // constructor inversion (the x119/x126 contract): planted re-masters
    // land at Hamming distance 0, everything else stays out
    "x130_video_neardup" ->
      """SELECT CAST(doc_id - 1 AS BIGINT) AS a, doc_id AS b,
        |       CAST(0 AS INT) AS dist
        |FROM documents
        |WHERE doc_id % 10 = 1
        |  AND doc_id - 1 IN (SELECT doc_id FROM documents)
        |ORDER BY a, b""".stripMargin,

    // DuckDB widens sum(INT) to HUGEINT → cast back; counts are BIGINT
    // on both engines
    "x131_half_unbounded" ->
      """SELECT doc_id,
        |  CAST(sum(n_chars) OVER (ORDER BY n_chars
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND 100 FOLLOWING)
        |    AS BIGINT) AS cum_look100,
        |  count(*) OVER (ORDER BY n_chars
        |    RANGE BETWEEN 50 PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS mass_from50,
        |  CAST(sum(n_chars) OVER wk AS BIGINT) AS lang_mass_ahead,
        |  count(*) OVER wp AS lang_cum_look
        |FROM documents
        |WHERE lang IN ('de', 'en', 'es', 'fr', 'zh')
        |WINDOW wk AS (PARTITION BY lang ORDER BY n_chars
        |    RANGE BETWEEN 50 PRECEDING AND UNBOUNDED FOLLOWING),
        |  wp AS (PARTITION BY lang ORDER BY n_chars
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND 100 FOLLOWING)
        |ORDER BY doc_id""".stripMargin)
}
