package graft.tables

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The fixture CONTRACT: every invariant the 162 `SparkEntry.queries`
  * entries lean on, asserted by name. The driver regenerates
  * `/root/testdata` between rounds, and silent drift has cost three
  * rounds of signal (r6: empty correctness file from a ts-vintage
  * change; r7: two red rows + two trivialized queries when `documents`
  * shrank and every customer gained an order). When a regeneration
  * breaks an assumption, this spec turns it into a NAMED failure
  * instead of a mysteriously red round. `tools/fixture_audit.py` is the
  * same contract as a driver-side (pyarrow/DuckDB) one-shot report.
  */
class FixtureContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  private def nonIntegral(c: String) =
    abs(col(c) * 100 - round(col(c) * 100)) > lit(1e-6)

  test("every fixture table is non-empty at both test scales") {
    for (d <- Seq("/root/testdata/sf0.001", sf)) {
      assert(Tables.lineitem(spark, d).limit(1).count() === 1, s"lineitem $d")
      assert(Tables.orders(spark, d).limit(1).count() === 1, s"orders $d")
      assert(Tables.customer(spark, d).limit(1).count() === 1, s"customer $d")
      assert(Tables.supplier(spark, d).limit(1).count() === 1, s"supplier $d")
      assert(Tables.part(spark, d).limit(1).count() === 1, s"part $d")
      assert(Tables.nation(spark, d).limit(1).count() === 1, s"nation $d")
      assert(Tables.region(spark, d).limit(1).count() === 1, s"region $d")
      assert(Tables.events(spark, d).limit(1).count() === 1, s"events $d")
      assert(Tables.documents(spark, d).limit(1).count() === 1, s"documents $d")
      assert(Tables.embeddings(spark, d).limit(1).count() === 1, s"embeddings $d")
    }
  }

  test("l_quantity is integral-valued (q17/x30 cross-multiply exactness)") {
    val li = Tables.lineitem(spark, sf)
    assert(li.filter(col("l_quantity") =!= floor(col("l_quantity"))).count() === 0L)
  }

  test("money columns are exact cents (the round(x*100) quantization contract)") {
    // every BIGINT-cents output (q17/q22/x30/x31 + the decimal folds)
    // assumes stored doubles are 2-decimal values; a fixture that starts
    // emitting sub-cent noise breaks round()-as-quantizer on BOTH engines
    val cases = Seq(
      Tables.lineitem(spark, sf) -> Seq("l_extendedprice", "l_discount", "l_tax"),
      Tables.orders(spark, sf) -> Seq("o_totalprice"),
      Tables.customer(spark, sf) -> Seq("c_acctbal"),
      Tables.part(spark, sf) -> Seq("p_retailprice"),
      Tables.supplier(spark, sf) -> Seq("s_acctbal"))
    for ((df, cols) <- cases; c <- cols)
      assert(df.filter(nonIntegral(c)).count() === 0L, s"$c carries sub-cent values")
  }

  test("events.ts vintage is readable and spans a real time range") {
    // Tables.events normalizes both observed vintages (TIMESTAMP(NANOS)
    // via nanosAsLong, naive micros via NTZ cast); a third vintage would
    // fall through and surface here as a type or span failure
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType === TimestampType,
      s"events.ts resolved to ${ev.schema("ts").dataType} — new fixture vintage?")
    val days = ev.select(countDistinct(to_date(col("ts")))).head().getLong(0)
    assert(days >= 5L, s"events span only $days distinct days — window suite degenerates")
  }

  test("j5_anti_join keep AND drop sides are non-empty") {
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    val cust = Tables.customer(spark, sf)
    val drop = cust.join(urgent, col("c_custkey") === col("o_custkey"), "left_semi").count()
    val keep = cust.join(urgent, col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(keep > 0L, "no customer lacks an URGENT order — j5 result would be the whole table")
    assert(drop > 0L, "no customer has an URGENT order — j5 anti-join would be trivial")
  }

  test("w11_cumulative_users first-purchase days form a non-degenerate curve") {
    val days = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(min(expr("unix_micros(ts) div 86400000000")).as("first_day"))
      .select(countDistinct(col("first_day"))).head().getLong(0)
    assert(days >= 3L, s"first purchases land on $days day(s) — cumulative curve collapsed")
  }

  test("x24_quality_report planted violations exist (dup line keys, ship-before-order)") {
    val li = Tables.lineitem(spark, sf)
    val dupKeys = li.groupBy("l_orderkey", "l_linenumber")
      .count().filter(col("count") > 1).limit(1).count()
    assert(dupKeys === 1L, "no duplicate (l_orderkey, l_linenumber) — unique check trivialized")
    val shipBefore = li.join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") < col("o_orderdate")).limit(1).count()
    assert(shipBefore === 1L, "no ship-before-order rows — temporal check trivialized")
  }

  test("documents corpus is non-degenerate (langs, sources, x49 source-id shape)") {
    val docs = Tables.documents(spark, sf)
    assert(docs.select(countDistinct(col("lang"))).head().getLong(0) >= 2L)
    assert(docs.select(countDistinct(col("source"))).head().getLong(0) >= 2L)
    assert(docs.filter(length(col("text")) === 0).count() === 0L, "empty texts")
    // x49 parses the numeric suffix after a 3-char prefix on both engines
    assert(docs.filter(!col("source").rlike("^src[0-9]+$")).count() === 0L,
      "source ids no longer match ^src<digits>$ — x49 substring parse breaks")
  }

  test("embeddings are fixed-width and non-empty (X4 family contract)") {
    val emb = Tables.embeddings(spark, sf)
    val dims = emb.select(countDistinct(size(col("embedding")))).head().getLong(0)
    assert(dims === 1L, "embedding vectors are not fixed-width")
    assert(emb.filter(size(col("embedding")) === 0).count() === 0L)
  }

  test("lang mixture is imbalanced (x53 must actually downsample something)") {
    val counts = Tables.documents(spark, sf).groupBy("lang")
      .agg(count(lit(1)).as("n")).collect().map(_.getLong(1))
    assert(counts.min < counts.max,
      "all langs equal-sized — x53's keep_pm is 1000 everywhere (trivialized)")
  }

  test("documents contain alphabetic words (x52 BPE vocabulary is non-empty)") {
    val words = graft.ml.Bpe.wordCounts(Tables.documents(spark, sf), "text")
    assert(words.limit(1).count() === 1L, "no ^[a-z]+$ words — BPE has no vocabulary")
  }

  test("events form transitions (x55's edge table is non-empty, several types)") {
    val ev = Tables.events(spark, sf)
    assert(ev.select(countDistinct(col("event_type"))).head().getLong(0) >= 2L)
    val edges = graft.ml.PageRank
      .transitions(ev, "user_id", "event_type", "ts", "event_id")
    assert(edges.limit(1).count() === 1L,
      "no user has two ordered events — the transition graph is empty")
  }

  // ---- round-8 diagnostics preconditions (x60-x70) ----

  test("events.value is positive-bounded (x60's floor(value*10) binning)") {
    val mm = Tables.events(spark, sf)
      .agg(min(col("value")), max(col("value"))).head()
    assert(mm.getDouble(0) >= 0.0, "negative values change the bin floor")
    assert(mm.getDouble(1) <= 1e6,
      "value range exploded — x60's bin count is no longer bounded")
  }

  test("x60's baseline event_type and a non-baseline type both exist") {
    val types = Tables.events(spark, sf).select("event_type")
      .distinct().collect().map(_.getString(0)).toSet
    assert(types.contains("view"), "x60/x60b baseline 'view' vanished")
    assert((types - "view").nonEmpty)
  }

  test("x61/x64's 'en' baseline exists and n_chars spans several bins") {
    val docs = Tables.documents(spark, sf)
    assert(docs.filter(col("lang") === "en").limit(1).count() === 1L,
      "x61's baseline language vanished")
    val bins = docs.select(countDistinct(expr("n_chars div 50"))).head().getLong(0)
    assert(bins >= 2L, "all docs in one length bin — drift trivially zero")
  }

  test("x68's re-crawl plant slices are non-empty (doc_id % 5 == 2 docs exist)") {
    val docs = Tables.documents(spark, sf)
    assert(docs.filter(pmod(col("doc_id"), lit(10L)) === 2).limit(1).count() === 1L,
      "x68's nested plant is empty — the overlap matrix trivializes")
  }

  test("x63 has multiple event days; x66 has multiple QI groups") {
    val days = Tables.events(spark, sf)
      .select(countDistinct(expr("unix_micros(ts) div 86400000000")))
      .head().getLong(0)
    assert(days >= 5L, "too few days for a median/MAD to mean anything")
    val qi = Tables.customer(spark, sf)
      .select(countDistinct(col("c_nationkey"), col("c_mktsegment")))
      .head().getLong(0)
    assert(qi >= 2L, "a single QI group trivializes x66")
  }

  test("embeddings carry several labels (x70's per-label centroids)") {
    val labels = Tables.embeddings(spark, sf)
      .select(countDistinct(col("label"))).head().getLong(0)
    assert(labels >= 2L, "one label collapses x70 to cos=1000 only")
  }

  // the op specs exercise x84/x86/x92 at sf0.001 while the oracle gate
  // runs sf0.01 — so these preconditions are asserted at BOTH scales
  private val bothScales = Seq("/root/testdata/sf0.001", sf)

  test("x84's purchase signal is sparse and multi-day (churn is non-trivial)") {
    // x84 defines activity as "purchased that day": if every user
    // purchases every day the matrix saturates to retained-only; if
    // purchases vanish it goes empty. Require several active days and a
    // per-user-day activity rate comfortably inside (0, 1).
    for (d <- bothScales) {
      val act = Tables.events(spark, d)
        .where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").cast("date").as("day"))
        .distinct()
      val days = act.select(countDistinct(col("day"))).head().getLong(0)
      assert(days >= 5L, s"too few purchase days for churn at $d")
      val users = Tables.events(spark, d)
        .select(countDistinct(col("user_id"))).head().getLong(0)
      val rate = act.count().toDouble / (days * users)
      assert(rate > 0.02 && rate < 0.98,
        f"purchase activity rate $rate%.3f saturates/empties churn at $d")
    }
  }

  test("x86 has converting users (view followed by a later purchase)") {
    for (d <- bothScales) {
      val e = Tables.events(spark, d)
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(ts)").as("us"))
      val v = e.where(col("event_type") === "view")
        .groupBy("user_id").agg(min("us").as("v_us"))
      val conv = e.join(v, "user_id")
        .where(col("event_type") === "purchase" && col("us") > col("v_us"))
        .select(countDistinct(col("user_id"))).head().getLong(0)
      assert(conv >= 2L,
        s"fewer than two view→purchase converters at $d")
    }
  }

  test("x89's (nation x segment) cells span both sides of the k=10 threshold") {
    val cells = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
    assert(cells.where(col("n") >= 10).limit(1).count() === 1L,
      "no cell reaches k=10 — suppression folds everything")
    assert(cells.where(col("n") < 10).limit(1).count() === 1L,
      "no cell below k=10 — suppression never fires")
  }

  test("x92 orders span several years; x93 has pairs at support 3") {
    for (d <- bothScales) {
      val years = Tables.orders(spark, d)
        .select(countDistinct(expr("year(o_orderdate)"))).head().getLong(0)
      assert(years >= 2L, s"single-year orders collapse LTV cohorts at $d")
    }
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val supported = items.as("a").join(items.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk"), col("b.pk")).agg(count(lit(1)).as("n"))
      .where(col("n") >= 3).limit(1).count()
    assert(supported === 1L, "no part pair reaches support 3 — x93 empty")
  }

  test("x81's orphan plant drops a non-empty parent slice on every edge") {
    // keys ≡ 3 (mod 97) must exist among each parent's REFERENCED keys,
    // or an edge of the referential-integrity audit reports zero orphans
    // and the anti-join is never exercised.
    def referenced(child: org.apache.spark.sql.DataFrame, key: String) =
      child.where(pmod(col(key), lit(97L)) === 3).limit(1).count()
    assert(referenced(Tables.lineitem(spark, sf), "l_orderkey") === 1L)
    assert(referenced(Tables.lineitem(spark, sf), "l_partkey") === 1L)
    assert(referenced(Tables.lineitem(spark, sf), "l_suppkey") === 1L)
    assert(referenced(Tables.orders(spark, sf), "o_custkey") === 1L)
  }
}
