package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.{DatasetDiff, Merge, Tables}
import graft.text.Search

/** Round-5b query entries: the correlated-subquery surface (TPC-H
  * q2/q4/q17/q21/q22 shapes adapted to the fixture schema — the reference's
  * Athena users write exactly these shapes, `/root/reference/README.md:274-296`
  * shows the style). These are deliberately expressed as SQL text via
  * `spark.sql` over temp views rather than the DataFrame API: the point of
  * the operator is Catalyst's subquery DECORRELATION — EXISTS / NOT EXISTS
  * rewritten to LeftSemi / LeftAnti hash joins, correlated scalar aggregates
  * rewritten to Aggregate + equi-join — so the plan never executes a
  * per-outer-row subquery and never degrades to a nested-loop product.
  * `SubqueryPlanSpec` pins those plan shapes.
  *
  * Cross-engine parity discipline: every boundary predicate that TPC-H
  * writes with a division (`l_quantity < 0.2 * avg(..)`, `c_acctbal >
  * avg(..)`) is cross-multiplied into pure integer / exact-decimal
  * arithmetic (`5 * qty * cnt < sum`), so the keep/drop boundary is
  * bit-identical in any engine; output money sums fold as BIGINT cents
  * (exact, order-independent) quantized once per row via the shared
  * double op `round(x * 100)` — raw >18-precision decimal outputs proved
  * hash-fragile across driver vintages (r7), so no output column is
  * wider than int64.
  */
object SparkEntryR5b {

  /** Register the fixture tables once per (session, dir) under stable
    * `r5b_`-prefixed names. Idempotent — re-registration binds the same
    * content, so concurrent spec/query use is benign.
    */
  private def registerViews(s: SparkSession, d: String): Unit = {
    Tables.lineitem(s, d).createOrReplaceTempView("r5b_lineitem")
    Tables.orders(s, d).createOrReplaceTempView("r5b_orders")
    Tables.part(s, d).createOrReplaceTempView("r5b_part")
    Tables.supplier(s, d).createOrReplaceTempView("r5b_supplier")
    Tables.customer(s, d).createOrReplaceTempView("r5b_customer")
    Tables.nation(s, d).createOrReplaceTempView("r5b_nation")
  }

  private def sql(s: SparkSession, d: String, q: String): DataFrame = {
    registerViews(s, d)
    s.sql(q)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q17 shape: small-quantity-order revenue. The classic form filters
    // lines with `l_quantity < 0.2 * avg(l_quantity) over the same part`;
    // here the correlated scalar average is cross-multiplied into two
    // correlated INTEGER aggregates (count, sum — l_quantity is
    // integral-valued in the fixtures, pinned by the cast) so the boundary
    // is engine-exact. Catalyst decorrelates both subqueries into one
    // per-part aggregate joined back on l_partkey.
    "q17_small_qty_revenue" -> ((s, d) => sql(s, d, """
      SELECT p_brand,
             CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents,
             COUNT(*) AS n_lines
      FROM r5b_lineitem l JOIN r5b_part p ON p_partkey = l_partkey
      WHERE 5 * CAST(l_quantity AS BIGINT)
              * (SELECT COUNT(*) FROM r5b_lineitem l2
                 WHERE l2.l_partkey = l.l_partkey)
            < (SELECT SUM(CAST(l_quantity AS BIGINT)) FROM r5b_lineitem l3
               WHERE l3.l_partkey = l.l_partkey)
      GROUP BY p_brand
      """)),

    // Q4 shape: order-priority checking — orders in a year window with at
    // least one returned line, counted by priority. The correlated EXISTS
    // must plan as a LeftSemi hash join on l_orderkey (pinned), i.e. the
    // lineitem side is scanned once, not once per order.
    "q4_priority_exists" -> ((s, d) => sql(s, d, """
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM r5b_orders
      WHERE o_orderdate >= CAST('1995-01-01' AS TIMESTAMP)
        AND o_orderdate <  CAST('1996-01-01' AS TIMESTAMP)
        AND EXISTS (SELECT 1 FROM r5b_lineitem
                    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      GROUP BY o_orderpriority
      """)),

    // Q21 shape: suppliers-who-kept-orders-waiting, with l_returnflag='R'
    // standing in for the reference schema's receipt-after-commit delay:
    // count, per supplier, their returned lines on multi-supplier orders
    // where NO other supplier had a return on the same order. Double
    // correlation — EXISTS (other supplier present) AND NOT EXISTS (other
    // supplier returned) — both on l_orderkey equality with a l_suppkey <>
    // residual, so both decorrelate to hash joins (LeftSemi + LeftAnti,
    // pinned), never a nested-loop product.
    "q21_waiting_supplier" -> ((s, d) => sql(s, d, """
      SELECT s_name, COUNT(*) AS numwait
      FROM r5b_supplier
        JOIN r5b_lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN r5b_orders ON o_orderkey = l1.l_orderkey
      WHERE l1.l_returnflag = 'R'
        AND EXISTS (SELECT 1 FROM r5b_lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM r5b_lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_returnflag = 'R')
      GROUP BY s_name
      """)),

    // Q22 shape: rich-but-idle customers — above-average account balance
    // (uncorrelated scalar subquery, cross-multiplied: acctbal * n > total
    // in exact decimal/bigint, no division) with no URGENT order (NOT
    // EXISTS → LeftAnti on o_custkey, pinned). Per-segment count + exact
    // BIGINT-cents balance total.
    "q22_idle_rich_customers" -> ((s, d) => sql(s, d, """
      SELECT c_mktsegment, COUNT(*) AS numcust,
             CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS totacctbal_cents
      FROM r5b_customer
      WHERE CAST(c_acctbal AS DECIMAL(18,2))
              * (SELECT COUNT(*) FROM r5b_customer WHERE c_acctbal > 0)
            > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) FROM r5b_customer
               WHERE c_acctbal > 0)
        AND NOT EXISTS (SELECT 1 FROM r5b_orders
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
      GROUP BY c_mktsegment
      """)),

    // X18: ranked text retrieval over the corpus (inverted-index search).
    // Integer-exact scaled tf-idf scoring (idf = (N·10⁶) DIV df, all
    // BIGINT) so the row is hash-exact cross-engine; one corpus scan, one
    // doc-keyed shuffle (terms pivoted to conditional counts), true top-k.
    // The real-BM25 twin is `x18_bm25_topk` (rows-only; ranking properties
    // in SearchSpec) — same split as HLL vs exact distinct.
    "x18_tfidf_search" -> ((s, d) =>
      Search.tfidfTopK(
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        Search.DefaultTerms, 20)),

    "x18_bm25_topk" -> ((s, d) =>
      Search.bm25TopK(
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        Search.DefaultTerms, 20)),

    // X19: SCD2 MERGE/upsert over PERSISTED versions — the incremental
    // lakehouse write path (see tables/Merge.scala for semantics and the
    // one-join + row-local-explode scale shape, pinned in MergeSpec). The
    // snapshot (current + closed history) and the change batch (updates,
    // idempotent re-deliveries, deletes, inserts, absent-key deletes) are
    // derived deterministically from `documents`, WRITTEN as real
    // hive-partitioned parquet trees (same lifecycle discipline as
    // x13_dataset_diff), and the merge consumes the read-back tables. The
    // oracle recomputes the same merge as a disjoint-case UNION.
    "x19_scd2_merge" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val curRows = docs.filter(col("doc_id") % 7 =!= 3)
        .select(col("doc_id"), col("text"),
          lit("2025-01-01").cast("timestamp").as("valid_from"),
          lit(null).cast("timestamp").as("valid_to"),
          lit(true).as("is_current"))
      val histRows = docs.filter(col("doc_id") % 11 === 0)
        .select(col("doc_id"), concat(col("text"), lit(" [old]")).as("text"),
          lit("2024-01-01").cast("timestamp").as("valid_from"),
          lit("2025-01-01").cast("timestamp").as("valid_to"),
          lit(false).as("is_current"))
      val changes = docs
        .filter(col("doc_id") % 9 === 0 || col("doc_id") % 5 === 0 ||
          col("doc_id") % 13 === 1 || col("doc_id") % 7 === 3)
        .select(col("doc_id"),
          when(col("doc_id") % 9 === 0, lit(null).cast("string"))
            .when(col("doc_id") % 5 === 0, concat(col("text"), lit(" [v2]")))
            .otherwise(col("text")).as("text"),
          when(col("doc_id") % 9 === 0, lit("delete"))
            .otherwise(lit("upsert")).as("op"))
      val root = DatasetDiff.ensureVersions(s, Seq("x19_versions", d),
        Seq("snapshot" -> curRows.unionByName(histRows), "changes" -> changes),
        partitionCol = Some(("part_bucket", pmod(col("doc_id"), lit(4L)))))
      Merge.applyScd2(
        s.read.parquet(s"$root/snapshot").drop("part_bucket"),
        s.read.parquet(s"$root/changes").drop("part_bucket"),
        "doc_id", "text", lit("2026-01-01").cast("timestamp"))
    }),

    // Q2 shape: best-supplier-per-nation — suppliers whose account balance
    // equals their nation's maximum (the fixture schema has no partsupp;
    // the correlated-scalar-max-per-group skeleton is the q2 core). Pure
    // stored-value equality (no float arithmetic). Decorrelates to a
    // per-nation max aggregate joined back on s_nationkey.
    "q2_top_supplier_per_nation" -> ((s, d) => sql(s, d, """
      SELECT n_name, s_name, s_acctbal
      FROM r5b_supplier JOIN r5b_nation ON s_nationkey = n_nationkey
      WHERE s_acctbal = (SELECT MAX(s2.s_acctbal) FROM r5b_supplier s2
                         WHERE s2.s_nationkey = r5b_supplier.s_nationkey)
      """))
  )

  /** DuckDB oracles: textually the same queries over the driver's standard
    * table names — the engine-exact boundary discipline above is what makes
    * "same text" also mean "same rows, same hash".
    */
  def oracleSql: Map[String, String] = Map(
    "q17_small_qty_revenue" -> """
      SELECT p_brand,
             CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents,
             COUNT(*) AS n_lines
      FROM lineitem l JOIN part p ON p_partkey = l_partkey
      WHERE 5 * CAST(l_quantity AS BIGINT)
              * (SELECT COUNT(*) FROM lineitem l2
                 WHERE l2.l_partkey = l.l_partkey)
            < (SELECT SUM(CAST(l_quantity AS BIGINT)) FROM lineitem l3
               WHERE l3.l_partkey = l.l_partkey)
      GROUP BY p_brand
      """,
    "q4_priority_exists" -> """
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders
      WHERE o_orderdate >= CAST('1995-01-01' AS TIMESTAMP)
        AND o_orderdate <  CAST('1996-01-01' AS TIMESTAMP)
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      GROUP BY o_orderpriority
      """,
    "q21_waiting_supplier" -> """
      SELECT s_name, COUNT(*) AS numwait
      FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
      WHERE l1.l_returnflag = 'R'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_returnflag = 'R')
      GROUP BY s_name
      """,
    "q22_idle_rich_customers" -> """
      SELECT c_mktsegment, COUNT(*) AS numcust,
             CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS totacctbal_cents
      FROM customer
      WHERE CAST(c_acctbal AS DECIMAL(18,2))
              * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0)
            > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer
               WHERE c_acctbal > 0)
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
      GROUP BY c_mktsegment
      """,
    "q2_top_supplier_per_nation" -> """
      SELECT n_name, s_name, s_acctbal
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE s_acctbal = (SELECT MAX(s2.s_acctbal) FROM supplier s2
                         WHERE s2.s_nationkey = supplier.s_nationkey)
      """,
    "x18_tfidf_search" -> {
      val toksSql =
        """CASE WHEN trim(text) = '' THEN [] ELSE string_split_regex(trim(lower(text)), '\s+') END"""
      val terms = graft.text.Search.DefaultTerms
      val inList = terms.map(t => s"'$t'").mkString(", ")
      val tfCols = terms.zipWithIndex.map { case (t, i) =>
        s"len(list_filter(tk, x -> x = '$t')) AS tf_$i"
      }.mkString(",\n             ")
      val dfCols = terms.indices.map(i =>
        s"CAST(SUM((tf_$i > 0)::BIGINT) AS BIGINT) AS df_$i").mkString(", ")
      val scoreSum = terms.indices.map(i =>
        s"tf_$i * ((n_docs * 1000000) // df_$i)").mkString(" + ")
      s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |m AS (
         |  SELECT doc_id,
         |         $tfCols
         |  FROM t
         |  WHERE len(list_filter(tk, x -> x IN ($inList))) > 0
         |),
         |dfs AS (SELECT $dfCols FROM m),
         |nd AS (SELECT COUNT(*) AS n_docs FROM documents)
         |SELECT doc_id, CAST($scoreSum AS BIGINT) AS score
         |FROM m, dfs, nd
         |ORDER BY score DESC, doc_id
         |LIMIT 20""".stripMargin
    },
    "x19_scd2_merge" -> """
      WITH cur AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 3),
      chg AS (
        SELECT doc_id,
               CASE WHEN doc_id % 9 = 0 THEN NULL
                    WHEN doc_id % 5 = 0 THEN text || ' [v2]'
                    ELSE text END AS payload,
               CASE WHEN doc_id % 9 = 0 THEN 'delete' ELSE 'upsert' END AS op
        FROM documents
        WHERE doc_id % 9 = 0 OR doc_id % 5 = 0 OR doc_id % 13 = 1
           OR doc_id % 7 = 3)
      -- history passthrough
      SELECT doc_id, text || ' [old]' AS text,
             TIMESTAMP '2024-01-01' AS valid_from,
             TIMESTAMP '2025-01-01' AS valid_to, FALSE AS is_current
      FROM documents WHERE doc_id % 11 = 0
      UNION ALL
      -- kept current: no change row, or an idempotent upsert re-delivery
      SELECT c.doc_id, c.text, TIMESTAMP '2025-01-01',
             CAST(NULL AS TIMESTAMP), TRUE
      FROM cur c LEFT JOIN chg g USING (doc_id)
      WHERE g.doc_id IS NULL
         OR (g.op = 'upsert' AND g.payload IS NOT DISTINCT FROM c.text)
      UNION ALL
      -- closed: delete, or upsert with a different payload
      SELECT c.doc_id, c.text, TIMESTAMP '2025-01-01',
             TIMESTAMP '2026-01-01', FALSE
      FROM cur c JOIN chg g USING (doc_id)
      WHERE g.op = 'delete'
         OR (g.op = 'upsert' AND g.payload IS DISTINCT FROM c.text)
      UNION ALL
      -- new current: changed upsert or insert of an absent key
      SELECT g.doc_id, g.payload, TIMESTAMP '2026-01-01',
             CAST(NULL AS TIMESTAMP), TRUE
      FROM chg g LEFT JOIN cur c USING (doc_id)
      WHERE g.op = 'upsert'
        AND (c.doc_id IS NULL OR g.payload IS DISTINCT FROM c.text)
      """
  )
}
