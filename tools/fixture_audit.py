#!/usr/bin/env python3
"""Round-start fixture audit (dev tool only; not part of the shipped Scala
library). The driver regenerates /root/testdata between rounds; this is the
pyarrow/DuckDB side of the contract that FixtureContractSpec asserts from
Spark. Run it FIRST each round:

    python3 tools/fixture_audit.py [sfDir ...]

Exit code 0 = every invariant holds; 1 = named violations printed.
"""
import sys
import glob
import os

import duckdb
import pyarrow.parquet as pq

DEFAULT_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
                "/root/testdata/sf0.1"]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
CENT_COLS = [("lineitem", "l_extendedprice"), ("lineitem", "l_discount"),
             ("lineitem", "l_tax"), ("orders", "o_totalprice"),
             ("customer", "c_acctbal"), ("part", "p_retailprice"),
             ("supplier", "s_acctbal")]


def audit(d: str) -> list:
    bad = []
    con = duckdb.connect()
    for t in TABLES:
        f = f"{d}/{t}.parquet"
        if not os.path.exists(f):
            bad.append(f"{t}: file missing")
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{f}'")
        if pq.read_metadata(f).num_rows == 0:
            bad.append(f"{t}: empty")
    if bad:
        return bad

    def one(sql):
        return con.execute(sql).fetchone()[0]

    # schema / physical-type vintage
    ts_type = str(pq.read_schema(f"{d}/events.parquet").field("ts").type)
    if ts_type not in ("timestamp[us]", "timestamp[ns]", "int64"):
        bad.append(f"events.ts physical type {ts_type}: unknown vintage — "
                   "check Tables.events normalization")

    # value invariants the BIGINT-cents queries lean on
    n = one("SELECT count(*) FROM lineitem WHERE l_quantity != floor(l_quantity)")
    if n:
        bad.append(f"l_quantity: {n} non-integral rows (q17/x30 exactness)")
    for t, c in CENT_COLS:
        n = one(f"SELECT count(*) FROM {t} WHERE abs({c}*100 - round({c}*100)) > 1e-6")
        if n:
            bad.append(f"{t}.{c}: {n} sub-cent rows (round(x*100) quantizer)")

    # non-triviality preconditions of specific queries
    keep = one("""SELECT count(*) FROM customer c WHERE NOT EXISTS
                  (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                   AND o.o_orderpriority = '1-URGENT')""")
    drop = one("SELECT count(*) FROM customer") - keep
    if keep == 0 or drop == 0:
        bad.append(f"j5_anti_join degenerate: keep={keep} drop={drop}")
    days = one("""SELECT count(DISTINCT dd) FROM (SELECT min(CAST(ts AS DATE)) dd
                  FROM events WHERE event_type = 'purchase' GROUP BY user_id)""")
    if days < 3:
        bad.append(f"w11 first-purchase days collapsed to {days}")
    ev_days = one("SELECT count(DISTINCT CAST(ts AS DATE)) FROM events")
    if ev_days < 5:
        bad.append(f"events span only {ev_days} days (window suite)")
    dup = one("""SELECT count(*) FROM (SELECT 1 FROM lineitem
                 GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)""")
    if dup == 0:
        bad.append("x24: no duplicate (l_orderkey, l_linenumber) violations")
    ship = one("""SELECT count(*) FROM lineitem l JOIN orders o
                  ON l_orderkey = o_orderkey WHERE l_shipdate < o_orderdate""")
    if ship == 0:
        bad.append("x24: no ship-before-order violations")
    langs = one("SELECT count(DISTINCT lang) FROM documents")
    srcs = one("SELECT count(DISTINCT source) FROM documents")
    if langs < 2 or srcs < 2:
        bad.append(f"documents degenerate: langs={langs} sources={srcs}")
    badsrc = one("SELECT count(*) FROM documents WHERE NOT regexp_matches(source, '^src[0-9]+$')")
    if badsrc:
        bad.append(f"documents.source: {badsrc} ids break ^src<digits>$ (x49)")
    widths = one("SELECT count(DISTINCT len(embedding)) FROM embeddings")
    if widths != 1:
        bad.append(f"embeddings: {widths} distinct vector widths")
    # round-8 preconditions
    balanced = one("""SELECT max(n) = min(n) FROM
                      (SELECT count(*) n FROM documents GROUP BY lang)""")
    if balanced:
        bad.append("langs equal-sized: x53 rebalance trivialized (keep_pm=1000)")
    alpha = one("""SELECT count(*) FROM (SELECT unnest(string_split_regex(
                   trim(lower(text)), '\\s+')) w FROM documents)
                   WHERE regexp_matches(w, '^[a-z]+$')""")
    if alpha == 0:
        bad.append("no ^[a-z]+$ words: x52 BPE vocabulary empty")
    trans = one("""SELECT count(*) FROM (SELECT user_id, count(*) n
                   FROM events GROUP BY user_id HAVING count(*) >= 2)""")
    etypes = one("SELECT count(DISTINCT event_type) FROM events")
    if trans == 0 or etypes < 2:
        bad.append(f"x55 transition graph degenerate: multi-event users={trans} "
                   f"event types={etypes}")
    # round-8 diagnostics preconditions (x60-x70; FixtureContractSpec twin)
    vmin, vmax = con.execute(
        "SELECT min(value), max(value) FROM events").fetchone()
    if vmin < 0 or vmax > 1e6:
        bad.append(f"events.value range [{vmin}, {vmax}]: x60 bin bound broken")
    has_view = one("SELECT count(*) FROM events WHERE event_type = 'view'")
    if has_view == 0:
        bad.append("x60/x60b baseline event_type 'view' vanished")
    has_en = one("SELECT count(*) FROM documents WHERE lang = 'en'")
    if has_en == 0:
        bad.append("x61/x64 baseline lang 'en' vanished")
    nbins = one("SELECT count(DISTINCT n_chars // 50) FROM documents")
    if nbins < 2:
        bad.append("all docs in one length bin: drift trivially zero")
    plant = one("SELECT count(*) FROM documents WHERE doc_id % 10 = 2")
    if plant == 0:
        bad.append("x68 re-crawl plant slice empty (doc_id % 10 = 2)")
    qi = one("SELECT count(*) FROM (SELECT 1 FROM customer "
             "GROUP BY c_nationkey, c_mktsegment)")
    if qi < 2:
        bad.append(f"x66: only {qi} QI group(s)")
    emb_labels = one("SELECT count(DISTINCT label) FROM embeddings")
    if emb_labels < 2:
        bad.append(f"x70: only {emb_labels} embedding label(s)")
    # round-8c/8d preconditions (x81/x84/x86; FixtureContractSpec twin)
    for child, key in [("lineitem", "l_orderkey"), ("lineitem", "l_partkey"),
                       ("lineitem", "l_suppkey"), ("orders", "o_custkey")]:
        if one(f"SELECT count(*) FROM {child} WHERE {key} % 97 = 3") == 0:
            bad.append(f"x81 plant empty: no {child}.{key} ≡ 3 (mod 97)")
    pdays, pcells = con.execute(
        """SELECT count(DISTINCT CAST(ts AS DATE)), count(*)
           FROM (SELECT DISTINCT user_id, CAST(ts AS DATE) AS ts
                 FROM events WHERE event_type = 'purchase')""").fetchone()
    users = one("SELECT count(DISTINCT user_id) FROM events")
    if pdays < 5:
        bad.append(f"x84: only {pdays} purchase day(s)")
    elif not (0.02 < pcells / (pdays * users) < 0.98):
        bad.append(f"x84 purchase activity rate {pcells/(pdays*users):.3f} "
                   "saturates/empties the churn matrix")
    conv = one("""SELECT count(*) FROM (
                    SELECT e.user_id FROM events e
                    JOIN (SELECT user_id, min(ts) v_ts FROM events
                          WHERE event_type = 'view' GROUP BY 1) v
                      ON e.user_id = v.user_id
                    WHERE e.event_type = 'purchase' AND e.ts > v.v_ts
                    GROUP BY e.user_id)""")
    if conv < 2:
        bad.append(f"x86: only {conv} view→purchase converter(s)")
    years = one("SELECT count(DISTINCT year(o_orderdate)) FROM orders")
    if years < 2:
        bad.append(f"x92: orders span only {years} year(s) — LTV cohorts trivial")
    if d.rstrip("/").endswith("sf0.01"):
        # x89 suppression must be exercised from both sides at the
        # correctness scale (cells straddle k=10)
        lo, hi = con.execute(
            """SELECT min(n), max(n) FROM (
                 SELECT count(*) AS n FROM customer c
                 JOIN nation nn ON c.c_nationkey = nn.n_nationkey
                 GROUP BY nn.n_name, c.c_mktsegment)""").fetchone()
        if not (lo < 10 <= hi):
            bad.append(f"x89 cells [{lo}, {hi}] no longer straddle k=10")
    return bad


def main():
    dirs = sys.argv[1:] or DEFAULT_DIRS
    failed = False
    for d in dirs:
        print(f"== {d} ==")
        for f in sorted(glob.glob(f"{d}/*.parquet")):
            s = pq.read_schema(f)
            cols = ", ".join(f"{n}:{s.field(n).type}" for n in s.names)
            print(f"  {os.path.basename(f)}: rows={pq.read_metadata(f).num_rows} | {cols}")
        bad = audit(d)
        for b in bad:
            print(f"  VIOLATION: {b}")
        failed |= bool(bad)
        if not bad:
            print("  contract OK")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
