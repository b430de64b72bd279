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
        |ORDER BY t.o_custkey, t.o_orderkey""".stripMargin)
}
