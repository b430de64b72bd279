package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables
import graft.text.{ShardManifest, TextOps}

/** Round-8 (continued, part h): the round's capstone composition —
  * a calibrated corpus release as ONE lazy plan. §2.12 extension.
  */
object SparkEntryR8h {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- X100: calibrated release (composition capstone) ----
    //
    // The full curation release the round's pieces exist for, composed
    // as ONE lazy plan (the x72 discipline): per-source quantile
    // normalization (x97 — so no source dominates just by its scorer's
    // scale) → global token-budget selection at 50% on the NORMALIZED
    // score (x51's level-frame discipline: the CDF and cutoff live on
    // a ≤1001-row level frame; the only per-doc ordered pass is inside
    // the single boundary level) → the released set's shard manifest
    // (x87 — what the release publishes for verification). Every stage
    // is a partial-agg shuffle, a broadcast of a bounded frame, or a
    // row-local filter; the corpus is never globally ordered.
    "x100_calibrated_release" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        col("source"), col("text"))
      val scored = docs.select(col("doc_id"), col("source"), col("text"),
        graft.util.Expr.bind(lower(col("text")), t =>
          (length(regexp_replace(t, "[^a-z]", "")) * lit(1000L) /
            greatest(length(t), lit(1))).cast("long")).as("q"),
        when(length(trim(col("text"))) === 0, lit(0L))
          .otherwise(size(split(trim(col("text")), "\\s+")).cast("bigint"))
          .as("toks"))
      // x97: per-source quantile rank on the bounded level frame
      val srcLevels = scored.groupBy("source", "q")
        .agg(count(lit(1)).as("c"))
      val wBelow = Window.partitionBy("source").orderBy("q")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wSrc = Window.partitionBy("source")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val mapping = srcLevels
        .withColumn("below", coalesce(sum("c").over(wBelow), lit(0L)))
        .withColumn("n_src", sum("c").over(wSrc))
        .select(col("source"), col("q"),
          expr("below * 1000 div n_src").as("norm"))
      val normed = scored.join(broadcast(mapping), Seq("source", "q"))
      // x51: token budget on the ≤1001-row NORM level frame
      val budget = normed.agg((sum("toks") / 2).cast("long").as("b"))
      val levels = normed.groupBy("norm").agg(sum("toks").as("s"))
        .withColumn("cum_before", coalesce(sum("s").over(
          Window.orderBy(col("norm").desc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .crossJoin(broadcast(budget))
        .select(col("norm"),
          (col("cum_before") + col("s") <= col("b")).as("full"),
          (col("cum_before") < col("b") &&
            col("cum_before") + col("s") > col("b")).as("boundary"),
          (col("b") - col("cum_before")).as("remaining"))
      val tagged = normed.join(broadcast(levels), "norm")
      val fullDocs = tagged.where(col("full"))
      // the one per-doc ordered pass: inside the single boundary level
      val wB = Window.partitionBy("norm").orderBy("doc_id")
      val boundaryDocs = tagged.where(col("boundary"))
        .withColumn("cum", sum("toks").over(wB))
        .where(col("cum") <= col("remaining"))
        .drop("cum")
      // x87: the release's verification manifest
      ShardManifest.manifest(
          fullDocs.unionByName(boundaryDocs).select("doc_id", "text"))
        .orderBy("shard")
    }))

  def oracleSql: Map[String, String] = Map(
    "x100_calibrated_release" -> {
      val shardHash = TextOps.rollingHashDuckSql(
        "'shuf1:' || text || ':' || CAST(doc_id AS VARCHAR)")
      val fp = TextOps.rollingHashDuckSql("text")
      s"""WITH scored AS (
         |  SELECT doc_id, source, text,
         |         length(regexp_replace(lower(text), '[^a-z]', '', 'g')) * 1000
         |           // greatest(length(text), 1) AS q,
         |         CASE WHEN trim(text) = '' THEN CAST(0 AS BIGINT)
         |              ELSE CAST(len(string_split_regex(trim(text),
         |                     '\\s+')) AS BIGINT)
         |         END AS toks
         |  FROM documents),
         |lv AS (SELECT source, q, CAST(count(*) AS BIGINT) AS c
         |       FROM scored GROUP BY 1, 2),
         |cdf AS (SELECT source, q,
         |               COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY q
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |                 0) AS below,
         |               SUM(c) OVER (PARTITION BY source) AS n_src
         |        FROM lv),
         |normed AS (SELECT s.doc_id, s.text, s.toks,
         |                  cdf.below * 1000 // cdf.n_src AS norm
         |           FROM scored s
         |           JOIN cdf ON cdf.source = s.source AND cdf.q = s.q),
         |bud AS (SELECT CAST(SUM(toks) // 2 AS BIGINT) AS b FROM normed),
         |nl AS (SELECT norm, CAST(SUM(toks) AS BIGINT) AS s FROM normed
         |       GROUP BY 1),
         |nlc AS (SELECT norm, s,
         |               COALESCE(SUM(s) OVER (ORDER BY norm DESC
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |                 0) AS cum_before
         |        FROM nl),
         |tag AS (SELECT nlc.norm,
         |               nlc.cum_before + nlc.s <= bud.b AS isfull,
         |               nlc.cum_before < bud.b
         |                 AND nlc.cum_before + nlc.s > bud.b AS boundary,
         |               bud.b - nlc.cum_before AS remaining
         |        FROM nlc CROSS JOIN bud),
         |kept AS (
         |  SELECT n.doc_id, n.text FROM normed n
         |  JOIN tag ON tag.norm = n.norm WHERE tag.isfull
         |  UNION ALL
         |  SELECT doc_id, text FROM (
         |    SELECT n.doc_id, n.text,
         |           SUM(n.toks) OVER (ORDER BY n.doc_id
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |             AS cum,
         |           tag.remaining
         |    FROM normed n JOIN tag ON tag.norm = n.norm
         |    WHERE tag.boundary)
         |  WHERE cum <= remaining),
         |t AS (SELECT ($shardHash) % 32 AS shard,
         |             CASE WHEN trim(text) = '' THEN CAST(0 AS BIGINT)
         |                  ELSE CAST(len(string_split_regex(trim(text),
         |                         '\\s+')) AS BIGINT)
         |             END AS toks,
         |             ($fp) AS fp
         |      FROM kept)
         |SELECT CAST(shard AS BIGINT) AS shard,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(toks) AS BIGINT) AS n_tokens,
         |       CAST(bit_xor(fp) AS BIGINT) AS checksum
         |FROM t GROUP BY 1 ORDER BY 1""".stripMargin
    })
}
