package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.tables.Tables

/** Round-15 query entries. §2.12 extension operators. */
object SparkEntryR15 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- X145: the rank-subquery JOIN spelling of top-n-per-group
    // (VERDICT r14 #3) ----
    //
    // "Top 2 orders per customer, with their rank" written the third
    // everyday way: join the table back against a row_number subquery
    // of ITSELF on the primary key. Stock Spark reads orders twice and
    // pays a full-table shuffle join on top of the window exchange;
    // `RankJoinRule` collapses it to ONE windowed scan — and because
    // the transferred `rn <= 2` lands as a bare rank-bound conjunct,
    // Spark's `InferWindowGroupLimit` additionally prunes to 2 rows
    // per customer map-side, BEFORE the exchange. The collapse is
    // gated on MEASURED uniqueness of the paired o_orderkey
    // (ndv == rowcount, registered at table load — evidence, never
    // declaration): without it, each probe row matching exactly its
    // own subquery copy is unprovable and the join stays. The ORDER BY
    // inside the window is tie-broken by o_orderkey, so row_number is
    // deterministic and the oracle (the IDENTICAL SQL in DuckDB,
    // executing the join as written) must match bit-for-bit.
    "x145_topn_rank_join" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("x145_orders")
      s.sql(
        """SELECT t.o_orderkey, t.o_custkey, t.o_totalprice, r.rn
          |FROM x145_orders t
          |JOIN (SELECT o_orderkey,
          |             row_number() OVER (PARTITION BY o_custkey
          |               ORDER BY o_totalprice DESC, o_orderkey) AS rn
          |      FROM x145_orders) r
          |ON t.o_orderkey = r.o_orderkey AND r.rn <= 2
          |ORDER BY t.o_custkey, rn, t.o_orderkey""".stripMargin)
    }),

    // ---- X146: the OUTER "flag the top-n rows" spelling (r15) ----
    //
    // "Every order, flagged when it is one of its customer's top 2 by
    // price" — the LEFT JOIN variant of x145 a reporting query writes
    // when it must KEEP all rows. Stock Spark reads orders twice and
    // shuffles the full table into the join; `RankJoinRule`'s outer
    // arm collapses it to one windowed scan where the rank columns
    // null off the match (`If(rn <= 2, …, null)`), multiplicities
    // exactly the outer join's under the measured o_orderkey
    // uniqueness. The oracle runs the IDENTICAL SQL in DuckDB.
    "x146_topn_flag_join" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("x146_orders")
      s.sql(
        """SELECT t.o_orderkey, t.o_custkey, t.o_totalprice,
          |       CASE WHEN r.rn IS NOT NULL THEN 1 ELSE 0 END AS is_top2,
          |       r.rn
          |FROM x146_orders t
          |LEFT JOIN (SELECT o_orderkey,
          |             row_number() OVER (PARTITION BY o_custkey
          |               ORDER BY o_totalprice DESC, o_orderkey) AS rn
          |           FROM x146_orders) r
          |ON t.o_orderkey = r.o_orderkey AND r.rn <= 2
          |ORDER BY t.o_custkey, t.o_orderkey""".stripMargin)
    }),

    // ---- X147: round-15 capstone — both r15-era eliminations in ONE
    // plan, across two tables ----
    //
    // Line items enriched with (a) their return-flag group stats via
    // the keys-only attach join (x144 shape — IN-pinned 3-key proof,
    // collapses to a window attach, lineitem scanned ONCE) and (b)
    // "is this line's order one of its customer's top-2 by price" via
    // the OUTER rank-flag self-join (x146 shape — collapses to one
    // windowed orders scan under the measured o_orderkey uniqueness).
    // Stock Spark pays four scans (two per self-join) plus two join
    // shuffles; the composition plans TWO scans and one broadcast
    // enrich. The oracle runs the IDENTICAL SQL in DuckDB.
    "x147_flagged_lineitem_panel" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("x147_orders")
      Tables.lineitem(s, d).createOrReplaceTempView("x147_lineitem")
      s.sql(
        """WITH flags AS (
          |  SELECT t.o_orderkey, r.rn
          |  FROM x147_orders t
          |  LEFT JOIN (SELECT o_orderkey,
          |               row_number() OVER (PARTITION BY o_custkey
          |                 ORDER BY o_totalprice DESC, o_orderkey) AS rn
          |             FROM x147_orders) r
          |  ON t.o_orderkey = r.o_orderkey AND r.rn <= 2),
          |flagged AS (
          |  SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
          |  FROM x147_lineitem WHERE l_returnflag IN ('A', 'N', 'R'))
          |SELECT f.l_orderkey, f.l_linenumber, f.l_returnflag,
          |       f.l_quantity, g.n_items, g.max_qty,
          |       CASE WHEN fl.rn IS NOT NULL THEN 1 ELSE 0 END
          |         AS order_is_top2
          |FROM flagged f
          |JOIN (SELECT l_returnflag, count(*) AS n_items,
          |             max(l_quantity) AS max_qty
          |      FROM flagged GROUP BY l_returnflag) g
          |  ON f.l_returnflag = g.l_returnflag
          |JOIN flags fl ON f.l_orderkey = fl.o_orderkey
          |ORDER BY f.l_orderkey, f.l_linenumber, f.l_returnflag,
          |         f.l_quantity""".stripMargin)
    }),

    // ---- X148: the rank-join spelling on the CORPUS table (r15) ----
    //
    // "Top 3 longest documents per (language, source)" written as the
    // self-join — the training-data curation shape (pick the best
    // exemplars per stratum) of the same x145 anti-pattern. doc_id's
    // measured uniqueness (registered by the documents loader) lets
    // the collapse fire on the corpus exactly as on orders: one scan,
    // map-side group-limit pruning, no join. Order is tie-broken by
    // doc_id so row_number is deterministic on both engines.
    "x148_topdocs_rank_join" -> ((s, d) => {
      Tables.documents(s, d).createOrReplaceTempView("x148_docs")
      s.sql(
        """SELECT t.doc_id, t.lang, t.source, t.n_chars, r.rn
          |FROM x148_docs t
          |JOIN (SELECT doc_id,
          |             row_number() OVER (PARTITION BY lang, source
          |               ORDER BY n_chars DESC, doc_id) AS rn
          |      FROM x148_docs) r
          |ON t.doc_id = r.doc_id AND r.rn <= 3
          |ORDER BY t.lang, t.source, rn, t.doc_id""".stripMargin)
    }))

  def oracleSql: Map[String, String] = Map(
    // the IDENTICAL rank-subquery join SQL — DuckDB executes the
    // two-scan join as written while Spark runs the rule's single-scan
    // group-limit-pruned window (rn cast to INTEGER: DuckDB's
    // row_number is BIGINT where Spark's is INT — type parity only)
    "x145_topn_rank_join" ->
      """SELECT t.o_orderkey, t.o_custkey, t.o_totalprice, r.rn
        |FROM orders t
        |JOIN (SELECT o_orderkey,
        |             CAST(row_number() OVER (PARTITION BY o_custkey
        |               ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |      FROM orders) r
        |ON t.o_orderkey = r.o_orderkey AND r.rn <= 2
        |ORDER BY t.o_custkey, rn, t.o_orderkey""".stripMargin,

    // the IDENTICAL outer flag-join SQL — DuckDB executes the two-scan
    // LEFT JOIN as written while Spark runs the one-scan If-wrapped
    // window attach (same INTEGER cast for type parity)
    "x146_topn_flag_join" ->
      """SELECT t.o_orderkey, t.o_custkey, t.o_totalprice,
        |       CASE WHEN r.rn IS NOT NULL THEN 1 ELSE 0 END AS is_top2,
        |       r.rn
        |FROM orders t
        |LEFT JOIN (SELECT o_orderkey,
        |             CAST(row_number() OVER (PARTITION BY o_custkey
        |               ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER)
        |               AS rn
        |           FROM orders) r
        |ON t.o_orderkey = r.o_orderkey AND r.rn <= 2
        |ORDER BY t.o_custkey, t.o_orderkey""".stripMargin,

    // the IDENTICAL capstone composition — DuckDB executes both
    // self-joins as written (rn never reaches the output, so no type
    // parity cast is needed)
    "x147_flagged_lineitem_panel" ->
      """WITH flags AS (
        |  SELECT t.o_orderkey, r.rn
        |  FROM orders t
        |  LEFT JOIN (SELECT o_orderkey,
        |               row_number() OVER (PARTITION BY o_custkey
        |                 ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |             FROM orders) r
        |  ON t.o_orderkey = r.o_orderkey AND r.rn <= 2),
        |flagged AS (
        |  SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
        |  FROM lineitem WHERE l_returnflag IN ('A', 'N', 'R'))
        |SELECT f.l_orderkey, f.l_linenumber, f.l_returnflag,
        |       f.l_quantity, g.n_items, g.max_qty,
        |       CASE WHEN fl.rn IS NOT NULL THEN 1 ELSE 0 END
        |         AS order_is_top2
        |FROM flagged f
        |JOIN (SELECT l_returnflag, count(*) AS n_items,
        |             max(l_quantity) AS max_qty
        |      FROM flagged GROUP BY l_returnflag) g
        |  ON f.l_returnflag = g.l_returnflag
        |JOIN flags fl ON f.l_orderkey = fl.o_orderkey
        |ORDER BY f.l_orderkey, f.l_linenumber, f.l_returnflag,
        |         f.l_quantity""".stripMargin,

    // the IDENTICAL corpus rank-join SQL (INTEGER cast: type parity)
    "x148_topdocs_rank_join" ->
      """SELECT t.doc_id, t.lang, t.source, t.n_chars, r.rn
        |FROM documents t
        |JOIN (SELECT doc_id,
        |             CAST(row_number() OVER (PARTITION BY lang, source
        |               ORDER BY n_chars DESC, doc_id) AS INTEGER) AS rn
        |      FROM documents) r
        |ON t.doc_id = r.doc_id AND r.rn <= 3
        |ORDER BY t.lang, t.source, rn, t.doc_id""".stripMargin)
}
