package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables
import graft.text.TextOps

/** Round-5 query entries: deeper multi-join analytics (TPC-H q7/q10/q18
  * shapes), training-data corpus operators (chunking, repetition-quality
  * metrics, temperature-weighted source mixing), tumbling event-time
  * windows, mergeable KLL quantile sketches, and CSV/JSON source
  * round-trips. Merged into `SparkEntry.queries`/`oracleSql`.
  *
  * Cross-engine parity discipline (same as the other entry files): money
  * sums fold as DECIMAL(25,4) so shuffle order cannot drift the hash;
  * ratios are integer/integer divisions (bit-exact in any IEEE-754
  * engine); sampling thresholds are pure integer arithmetic (`DIV`), so
  * the keep/drop boundary is engine-independent.
  */
object SparkEntryR5 {

  private def tmpBase(sfDir: String, name: String): String = {
    val leaf = new java.io.File(sfDir).getName
    s"${System.getProperty("java.io.tmpdir")}/graft_r5/$leaf/$name"
  }

  // DuckDB mirror of TextOps.tokens (same string as SparkEntryExt's)
  private val toksSql =
    """CASE WHEN trim(text) = '' THEN [] ELSE string_split_regex(trim(lower(text)), '\s+') END"""

  // DuckDB mirror of TextOps.rollingHash(text)
  private val fpSql =
    """CASE WHEN length(text) = 0 THEN CAST(0 AS BIGINT)
      |     ELSE list_reduce(list_transform(range(1, length(text)+1),
      |                                     i -> CAST(ascii(text[i]) AS BIGINT)),
      |                      (acc, c) -> (acc*31 + c) % 2147483647)
      |END""".stripMargin

  /** Skew-planted corpus for the temperature mix: src0 tripled, src1
    * doubled (ids offset so rows stay unique), every other source at its
    * fixture size — a Zipfian-ish head the mixer must flatten.
    */
  private def skewedCorpus(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"), col("source"))
    docs
      .unionByName(docs.filter(col("source").isin("src0", "src1"))
        .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"), col("source")))
      .unionByName(docs.filter(col("source") === "src0")
        .select((col("doc_id") + lit(2000000L)).as("doc_id"), col("text"), col("source")))
  }

  private val skewedCorpusSql =
    """SELECT doc_id, text, source FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text, source FROM documents
      |  WHERE source IN ('src0', 'src1')
      |  UNION ALL
      |  SELECT doc_id + 2000000, text, source FROM documents
      |  WHERE source = 'src0'""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- deeper TPC-H-shape analytics over the fixture star schema ----

    // Q7 shape: cross-nation volume shipping — supplier nation ↔ customer
    // nation trade in both directions, by ship year. Two nation dims join
    // the same table twice (alias discipline); both are broadcast at
    // defaults. DECIMAL-exact revenue, same q5/q9 discipline.
    "q7_nation_volume" -> ((s, d) => {
      val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(25,4)")
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("supp_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("cust_nk"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .join(n1, col("s_nationkey") === col("supp_nk"))
        .join(n2, col("c_nationkey") === col("cust_nk"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(rev).cast("double").as("revenue"))
    }),

    // Q10 shape: returned-item revenue ranking — which customers returned
    // the most value in 1996H1. 4-way join, grouped decimal revenue, then
    // a true top-k (TakeOrderedAndProject, pinned in PlanAuditSpec): at
    // 100 TB the full customer ranking never materializes, each partition
    // keeps 20 rows. Tiebreak on c_custkey keeps the cut deterministic.
    "q10_returned_items" -> ((s, d) => {
      val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(25,4)")
      Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-07-01").cast("timestamp")),
          col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .join(Tables.nation(s, d), col("n_nationkey") === col("c_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(rev).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q18 shape: large-volume orders — groupBy-HAVING on the fact table,
    // then the qualifying keys (few) join back to orders + customer. The
    // HAVING prunes before the dimension joins, so the expensive side of
    // the plan carries only qualifying orders. l_quantity is
    // integer-valued in the fixture → the double sum is exact and the
    // `> 300` boundary is engine-independent.
    "q18_large_orders" -> ((s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("tot"))
        .filter(col("tot") > 300.0)
      Tables.orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          col("tot").cast("long").as("sum_qty"))
    }),

    // ---- training-data corpus operators ----

    // X14: document chunking — fixed-size token windows (64 tokens,
    // stride 48 → 16-token overlap), the standard pretraining chunker.
    // Pure per-row explode arithmetic: no shuffle anywhere (pinned in
    // PlanAuditSpec) — embarrassingly parallel at any scale.
    "x14_chunk_docs" -> ((s, d) =>
      TextOps.chunkDocs(Tables.documents(s, d), "doc_id", "text",
        chunkTokens = 64, stride = 48)),

    // X15: repetition/quality metrics (Gopher-style filters): duplicate-
    // token fraction and top-bigram fraction per document, plus the keep
    // decision at (0.55, 0.05) — thresholds that split the fixture corpus
    // rather than rubber-stamp it. All ratios are int/int divisions of
    // counts → bit-exact across engines, so the keep boundary is stable.
    // One compiled O(tokens) pass per row (native RepetitionStats kernel —
    // the interpreted HOF formulation it replaced measured ~0.8 ms/row);
    // row-local, no shuffle; fine even for 100 KB documents.
    "x15_repetition" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextOps.repetitionStats(TextOps.tokens(col("text"))).as("__st"))
        .select(col("doc_id"),
          col("__st.dup_frac").as("dup_frac"),
          col("__st.top_bigram_frac").as("top_bigram_frac"))
        .withColumn("keep",
          col("dup_frac") <= 0.55 && col("top_bigram_frac") <= 0.05)),

    // X16: temperature-weighted source mixing (α = 0.5) — the domain-
    // rebalancing step of corpus assembly: source s keeps
    // T·w_s/(Σw·n_s) of its docs where w_s = ⌊√n_s⌋, flattening a
    // Zipfian source head (planted here: src0×3, src1×2). The keep
    // decision is ONE integer per-mill threshold per source (all-integer
    // arithmetic → cross-engine-exact) applied to the content hash — no
    // RNG, reproducible across runs/partitionings. Plan shape: one tiny
    // groupBy(source) aggregate, thresholds broadcast back onto the
    // corpus scan (pinned) — the 100 TB path touches each doc once.
    "x16_temperature_mix" -> ((s, d) => {
      val corpus = skewedCorpus(s, d)
      val weights = corpus.groupBy(col("source"))
        .agg(count(lit(1)).as("n_s"))
        .withColumn("w", floor(sqrt(col("n_s"))).cast("long"))
      val total = weights.agg(sum(col("w")).as("total_w"))
      val thr = weights.crossJoin(broadcast(total))
        .select(col("source"),
          expr("CAST((300000 * w) DIV (total_w * n_s) AS BIGINT)").as("t"))
      corpus.join(broadcast(thr), "source")
        .filter(pmod(TextOps.rollingHash(col("text")), lit(1000L)) < col("t"))
        .select(col("doc_id"), col("source"))
    }),

    // A7: mergeable KLL quantile sketches (Datasketches KLL, custom
    // TypedImperativeAggregate) — the approximate twin of a3b for the
    // incremental-stats lifecycle: per-partition sketches merge losslessly
    // w.r.t. the sketch's rank guarantees (±1.65% rank error at k=200),
    // so percentiles over 100 TB come from unioning tiny stored sketches
    // instead of rescanning. Approximate by construction → rows-only here
    // (KLL compaction is randomized, values vary run to run but the row
    // set is the 3 asset groups); rank-error tolerance AND the
    // merged==direct-within-tolerance lifecycle are asserted in SketchSpec.
    "a7_kll_quantiles" -> ((s, d) => {
      import org.apache.spark.sql.graft.ColumnBridge
      val li = Tables.lineitem(s, d)
      val sk = ColumnBridge.column(
        graft.expressions.KllSketchAgg(
          ColumnBridge.expression(col("l_extendedprice")), 200)
          .toAggregateExpression())
      def q(c: org.apache.spark.sql.Column, r: Double) =
        ColumnBridge.column(graft.expressions.KllQuantile(
          ColumnBridge.expression(c),
          ColumnBridge.expression(lit(r))))
      li.groupBy(col("l_returnflag").as("ativo"))
        .agg(sk.as("__sk"))
        .select(col("ativo"), q(col("__sk"), 0.5).as("p50_approx"),
          q(col("__sk"), 0.9).as("p90_approx"))
    }),

    // X17: the END-TO-END corpus curation pipeline — the LLM-data flagship:
    // quality filter → exact dedup → benchmark decontamination →
    // per-source cap → chunking, composed as ONE lazy plan (planted exact
    // duplicates prove the dedup stage actually fires). Every stage is the
    // library's scale form: row-local quality arithmetic rides the scan,
    // dedup shuffles on (xxhash64, text), decontamination is a shingle
    // equi-join (never all-pairs), the cap is the bounded-heap aggregate
    // (no per-source sort), chunking is shuffle-free explode. The DuckDB
    // oracle recomputes all five stages — a green row proves the
    // composition, not just each operator alone.
    "x17_curation_pipeline" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.graft.ColumnBridge
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"), col("source"))
      val planted = docs.unionByName(docs.select(
        (col("doc_id") + lit(1000000L)).as("doc_id"), col("text"), col("source")))
      // stage 1: quality gate (int-ratio arithmetic → engine-exact boundary)
      val scored = planted.filter(
        TextOps.qualityScore(col("text"), TextOps.tokens(col("text"))) >= 0.5)
      // stage 2: exact dedup, min-id survivor, hash-led shuffle key
      val w = Window.partitionBy(xxhash64(col("text")), col("text"))
        .orderBy(col("doc_id"))
      val deduped = scored.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
      // stage 3: decontamination vs the eval suite (every 50th original doc)
      val evalSet = Tables.documents(s, d).filter(pmod(col("doc_id"), lit(50L)) === 0)
      val clean = TextOps.decontaminate(deduped, evalSet)
      // stage 4: ≤20 docs per source by content-hash order (bounded heap)
      val score = -coalesce(TextOps.rollingHash(col("text")), lit(2147483647L))
        .cast("double")
      val topk = ColumnBridge.column(
        graft.expressions.TopKByScore(
          ColumnBridge.expression(score),
          ColumnBridge.expression(col("doc_id").cast("long")), 20)
          .toAggregateExpression())
      val keptIds = clean.groupBy(col("source")).agg(topk.as("__kept"))
        .select(explode(col("__kept.id")).as("doc_id"))
      val kept = clean.join(broadcast(keptIds), "doc_id")
      // stage 5: chunk survivors into training windows
      TextOps.chunkDocs(kept, "doc_id", "text", chunkTokens = 64, stride = 48)
        .select(col("doc_id"), col("chunk_idx"), col("n_tok"))
    }),

    // ---- event-time windows ----

    // W5: tumbling 1-hour event-time windows via the built-in `window()`
    // (epoch-aligned, exactly integer-div bucketing on micros — which is
    // how the oracle states it). Counts and exact distincts only: every
    // output column is integer math, no float fold-order concerns. The
    // streaming twin (same agg under a watermark, AvailableNow) is
    // asserted equal to this batch result in StreamingWindowSpec.
    "w5_tumbling_agg" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .select(unix_micros(col("w.start")).as("win_start_us"),
          col("n_events"), col("n_users"))),

    // ---- CSV / JSON source round-trips (S-family widening) ----

    // S8: CSV sink + schema'd CSV source — write the nation dim as
    // headered CSV, read it back with the ORIGINAL schema (no inference
    // pass — schema-on-read is the 100 TB discipline; an inference pass
    // would scan the data twice). Quoting/escaping round-trips through
    // Spark's writer; the oracle is the parquet table itself, so a green
    // row proves the text round trip loses nothing.
    "s8_csv_roundtrip" -> ((s, d) => {
      val root = tmpBase(d, "csv_nation")
      val nat = Tables.nation(s, d)
      nat.write.mode(SaveMode.Overwrite).option("header", "true").csv(root)
      s.read.schema(nat.schema).option("header", "true").csv(root)
    }),

    // S9: JSON-lines sink + schema'd JSON source — same round-trip
    // contract for the supplier dim (doubles survive: Spark writes
    // shortest-round-trip literals and the schema'd reader parses them
    // back bit-exact). Malformed-record handling (PERMISSIVE +
    // columnNameOfCorruptRecord vs FAILFAST) is pinned in
    // SourcesRoundtripSpec.
    "s9_json_roundtrip" -> ((s, d) => {
      val root = tmpBase(d, "json_supplier")
      val sup = Tables.supplier(s, d)
      sup.write.mode(SaveMode.Overwrite).json(root)
      s.read.schema(sup.schema).json(root)
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(year(l_shipdate) AS INT) AS l_year,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |                    AS DECIMAL(25,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |                    AS DECIMAL(25,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation ON n_nationkey = c_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, SUM(l_quantity) AS tot
        |  FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 300
        |)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        |       CAST(tot AS BIGINT) AS sum_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey""".stripMargin,

    "x14_chunk_docs" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |st AS (
         |  SELECT doc_id, tk, unnest(range(0, len(tk), 48)) AS start
         |  FROM t WHERE len(tk) > 0
         |)
         |SELECT doc_id, start // 48 AS chunk_idx,
         |       CAST(len(tk[start+1:start+64]) AS BIGINT) AS n_tok,
         |       array_to_string(tk[start+1:start+64], ' ') AS chunk_text
         |FROM st""".stripMargin,

    "x15_repetition" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |m AS (
         |  SELECT doc_id, len(tk) AS n, len(list_distinct(tk)) AS nd,
         |         CASE WHEN len(tk) >= 2
         |              THEN list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])
         |              ELSE [] END AS bg
         |  FROM t
         |),
         |f AS (
         |  SELECT doc_id,
         |         CASE WHEN n > 0 THEN CAST(n - nd AS DOUBLE) / n
         |              ELSE 0.0 END AS dup_frac,
         |         CASE WHEN len(bg) > 0
         |              THEN CAST(list_max(list_transform(list_distinct(bg),
         |                     b -> len(list_filter(bg, x -> x = b)))) AS DOUBLE)
         |                   / len(bg)
         |              ELSE 0.0 END AS top_bigram_frac
         |  FROM m
         |)
         |SELECT doc_id, dup_frac, top_bigram_frac,
         |       dup_frac <= 0.55 AND top_bigram_frac <= 0.05 AS keep
         |FROM f""".stripMargin,

    "x16_temperature_mix" ->
      s"""WITH corpus AS ($skewedCorpusSql),
         |c AS (SELECT source, COUNT(*) AS n_s FROM corpus GROUP BY 1),
         |w AS (SELECT source, n_s, CAST(FLOOR(SQRT(n_s)) AS BIGINT) AS w FROM c),
         |thr AS (
         |  SELECT source, (300000 * w) // ((SELECT SUM(w) FROM w) * n_s) AS t
         |  FROM w
         |)
         |SELECT doc_id, source FROM corpus JOIN thr USING (source)
         |WHERE ($fpSql) % 1000 < t""".stripMargin,

    "x17_curation_pipeline" -> {
      val enStop = TextOps.EnStop.map(w => s"'$w'").mkString(", ")
      val sh3 = "CASE WHEN len(tk) >= 3 THEN list_transform(range(1, len(tk)-1), " +
        "i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) ELSE [] END"
      s"""WITH all_docs AS (
         |  SELECT doc_id, text, source FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text, source FROM documents
         |),
         |t AS (SELECT doc_id, text, source, $toksSql AS tk FROM all_docs),
         |scored AS (
         |  SELECT doc_id, text, source, tk FROM t
         |  WHERE CASE WHEN len(tk) = 0 THEN 0.0 ELSE
         |          0.4 * least(CAST(len(list_filter(tk, x -> x IN ($enStop))) AS DOUBLE)
         |                        / CAST(len(tk) AS DOUBLE) * 5.0, 1.0)
         |          + 0.3 * (CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
         |                     / length(text))
         |          + 0.3 * least(CAST(len(tk) AS DOUBLE) / 100.0, 1.0)
         |        END >= 0.5
         |),
         |ded AS (
         |  SELECT doc_id, text, source, tk FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
         |    FROM scored
         |  ) WHERE rn = 1
         |),
         |ev AS (
         |  SELECT DISTINCT unnest(list_distinct($sh3)) AS sh
         |  FROM (SELECT $toksSql AS tk FROM documents WHERE doc_id % 50 = 0)
         |),
         |ds AS (SELECT doc_id, unnest(list_distinct($sh3)) AS sh FROM ded),
         |bad AS (
         |  SELECT doc_id FROM ds JOIN ev USING (sh)
         |  GROUP BY doc_id HAVING COUNT(*) >= 5
         |),
         |clean AS (
         |  SELECT doc_id, text, source, tk FROM ded
         |  WHERE doc_id NOT IN (SELECT doc_id FROM bad)
         |),
         |capped AS (
         |  SELECT doc_id, tk FROM (
         |    SELECT doc_id, tk,
         |           ROW_NUMBER() OVER (PARTITION BY source
         |             ORDER BY ($fpSql) NULLS LAST, doc_id) AS rn
         |    FROM clean
         |  ) WHERE rn <= 20
         |)
         |SELECT doc_id, start // 48 AS chunk_idx,
         |       CAST(len(tk[start+1:start+64]) AS BIGINT) AS n_tok
         |FROM (SELECT doc_id, tk, unnest(range(0, len(tk), 48)) AS start
         |      FROM capped WHERE len(tk) > 0)""".stripMargin
    },

    "w5_tumbling_agg" ->
      """SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600000000
        |         AS win_start_us,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY 1""".stripMargin,

    "s8_csv_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",

    "s9_json_roundtrip" ->
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier"
  )
}
