package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Json

/** Benchmark main. Emission contract (VERDICT r6 #2): the full per-query
  * JSON grew past the driver's 2000-char stdout capture, so the LAST
  * stdout line is now a compact summary —
  * `{"metric":"total","value":N,"unit":"sec","sf":...,"n":...,"error_count":N,"detail":...}`
  * — and the per-query medians/spreads/errors go to a detail file
  * (`SPARK_GRAFT_DETAIL_OUT`, default `BENCH_DETAIL.json` beside the
  * repo) plus one full-format line printed BEFORE the summary for any
  * consumer that reads whole stdout. `queries` holds the per-query
  * MEDIAN of 3 isolated runs and `spread` the [min,max] (VERDICT r2 #10).
  *
  * Two fixes over round 1 (VERDICT findings 1–2):
  *   - every query is forced to FULL evaluation — `xxhash64` over a struct of
  *     every output column, reduced to one `sum` — so Catalyst cannot prune
  *     the operators under test the way a bare `count()` lets it (windows,
  *     JSON extraction and projections were dead code under `count`);
  *   - per-query failures are reported in an `"errors"` object instead of
  *     being swallowed and emitted as a fast timing.
  *
  * A full warm-up pass runs first so the measured pass is not dominated by
  * JIT/codegen-cache/parquet-footer first-touch costs.
  *
  * Drift attribution (VERDICT r9 #3): a ~20-query canary set reruns in
  * fixed order at the start and end of the measured pass; its end/start
  * ratio is published as `"drift"` in the summary and `"canary"` (with
  * per-query times) in the detail, separating environment drift from
  * per-query change. `"floor_total"` (sum of per-query minima) is the
  * least-noise engine-cost estimate beside the median-sum `"value"`.
  *
  * Floor attribution (VERDICT r10 #6): any query whose per-run floor
  * moved >1.5× versus the PREVIOUS round's detail file
  * (`SPARK_GRAFT_PREV_DETAIL`, default the detail path itself, read
  * before overwrite) is re-measured ISOLATED at the end of the run and
  * published as `"isolated"` beside `"floor_moved"` — neighbor cache
  * pressure becomes a number instead of an assertion.
  */
object Bench {

  /** Reduce a result to one row while touching every column of every row.
    * The hash is summed as double: the value is irrelevant (only the forced
    * evaluation matters) and a long sum of 64-bit hashes overflows under
    * ANSI mode.
    */
  private def force(df: DataFrame): Unit = {
    val h = xxhash64(struct(df.columns.toIndexedSeq.map(col): _*))
    df.select(sum(h.cast("double"))).collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // library extension point: native SQL functions + the RangeJoin/
      // GlobalRank auto-rewrites run exactly as a production session would
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS); see Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // local-FS harness: skip Hadoop CRC shadow files (halves file ops
      // on partitioned writes; checksums are a distributed-FS concern)
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      // bucketed-layout tables (j6) live in the warehouse — keep it in tmp
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // optional args: bench only the named queries (dev A/B timing; the
    // driver invokes with no args → full suite)
    val names =
      if (args.nonEmpty) args.toSeq.sorted
      else SparkEntry.queries.keys.toSeq.sorted
    // Warm-up (failures are surfaced by the measured pass below).
    names.foreach { n =>
      val t0 = System.nanoTime()
      try force(SparkEntry.queries(n)(spark, sfDir))
      catch { case _: Throwable => () }
      System.err.println(f"[bench] warmup $n ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    // Canary drift measurement (VERDICT r9 #3): a single full-suite run
    // cannot distinguish a sandbox-contention drift from an engine
    // regression. A fixed ~20-query subset reruns in FIXED order at the
    // start and again at the end of the measured pass; identical code on
    // identical data, so the end/start ratio measures WITHIN-RUN
    // environment drift — published beside the per-query numbers so a
    // "+16% total" can be attributed (or not) to load noise.
    val canaryNames = {
      val step = math.max(1, names.size / 20)
      names.zipWithIndex.collect { case (n, i) if i % step == 0 => n }
    }
    def canaryPass(): Seq[(String, Double)] = canaryNames.flatMap { n =>
      stats.GlobalRank.releaseAll()
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      try { force(SparkEntry.queries(n)(spark, sfDir))
        Some(n -> (System.nanoTime() - t0) / 1e9)
      } catch { case _: Throwable => None }
    }
    // Cross-RUN calibration (the canary above only measures WITHIN-run
    // drift): two fixed workloads, identical across runs AND rounds —
    // a full scan+hash-fold of lineitem (IO+codegen) and a fixed-count
    // driver-side LCG loop (pure CPU). Comparing calib numbers between
    // two BENCH_DETAIL files says how much of a total delta is machine
    // state (page cache, host contention) before any per-query reading.
    def calibrate(): (Double, Double) = {
      val t0 = System.nanoTime()
      // max, not sum: full-range hashes overflow a long sum under ANSI
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .selectExpr("max(xxhash64(l_orderkey, l_extendedprice))", "count(*)")
        .collect()
      val io = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      var acc = 0L
      var i = 0L
      while (i < 200000000L) { acc = acc * 6364136223846793005L + i; i += 1L }
      val cpu = (System.nanoTime() - t1) / 1e9
      if (acc == 42L) System.err.println("calib") // keep the fold live
      (io, cpu)
    }
    val (calIoS, calCpuS) = calibrate()
    System.err.println(f"[bench] calib start io ${calIoS}%.2fs cpu ${calCpuS}%.2fs")

    // Discard-first-lap protocol (VERDICT r14 #6): r14's official run
    // opened 26% slow (drift 0.79) even though every query had a warm-up
    // pass — the first MEASURED lap still absorbed C2 compilation and
    // allocator settle from the warm-up churn itself. Two extra canary
    // laps, run under the exact isolation discipline the measured laps
    // use and then thrown away, settle the JVM before anything counts.
    // Measured honestly (r15): one lap took the cold-open from 0.79 to
    // 0.91; past that, drift is dominated by AMBIENT host variance in
    // either direction (a second-lap run measured 1.23 — the END
    // inflated mid-run, which no start-side settle can fix). The
    // per-query median-of-3 with isolation and the floor_total (sum of
    // per-query minima) are the noise defenses that actually bound the
    // comparison; drift is the attribution signal that says which runs
    // to distrust.
    (1 to 2).foreach { lap =>
      val t0 = System.nanoTime()
      canaryPass()
      System.err.println(
        f"[bench] settle lap $lap (discarded) ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }

    val canaryStart = canaryPass()

    // median of 3 isolated runs per query (VERDICT r2 #10): full-suite
    // per-query noise is ±50% from GC/page-cache interference, enough to
    // mask a real 2× regression under a single sample; the median of three
    // is robust to one bad draw and the [min,max] spread is reported so a
    // noisy median is visible as such.
    val Runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val times = names.flatMap { n =>
      val samples = (1 to Runs).flatMap { _ =>
        if (errors.contains(n)) None
        else {
          // isolation between measurements: drop persisted/broadcast
          // blocks accumulated by earlier queries (incl. GlobalRank sort
          // frames) and let the ContextCleaner run, so one query's
          // leftovers can't charge a GC pause to the next one's timer
          // (observed as a random ~45 s outlier per full-suite run)
          stats.GlobalRank.releaseAll()
          spark.catalog.clearCache()
          System.gc()
          val t0 = System.nanoTime()
          try {
            force(SparkEntry.queries(n)(spark, sfDir))
            Some((System.nanoTime() - t0) / 1e9)
          } catch {
            case e: Throwable =>
              errors(n) = Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
              System.err.println(s"[bench] $n FAILED: ${errors(n)}")
              None
          }
        }
      }
      if (samples.isEmpty) None
      else {
        val sorted = samples.sorted
        val median = sorted(sorted.size / 2)
        System.err.println(
          f"[bench] $n median $median%.2fs (min ${sorted.head}%.2f max ${sorted.last}%.2f)")
        Some(n -> (median, sorted.head, sorted.last))
      }
    }

    val canaryEnd = canaryPass()

    // Round-over-round floor attribution (VERDICT r10 #6): a per-query
    // floor that moved >1.5× since the LAST round's detail file gets an
    // ISOLATED re-measure — fresh cache/GC, run after everything else,
    // when no neighbor can charge it cache pressure. The re-measured
    // samples publish beside the in-run numbers, so "neighbor cache
    // pressure" is a number, not an assertion. The previous detail is
    // read BEFORE this run overwrites it.
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_DETAIL_OUT", "BENCH_DETAIL.json")
    val prevFloors: Map[String, Double] = {
      val path = sys.env.getOrElse("SPARK_GRAFT_PREV_DETAIL", detailPath)
      try {
        val text = new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
        val at = text.indexOf("\"spread\":{")
        if (at < 0) Map.empty
        else {
          val body = text.substring(at + 10, text.indexOf('}', at))
          """"([^"]+)":\[([-0-9.Ee+]+),""".r.findAllMatchIn(body)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
        }
      } catch { case _: Throwable => Map.empty }
    }
    val movedFloors: Seq[(String, Double, Double)] = times.flatMap {
      case (n, (_, lo, _)) => prevFloors.get(n).collect {
        case prev if prev > 0 && (lo > prev * 1.5 || lo < prev / 1.5) =>
          (n, prev, lo)
      }
    }
    val isolated: Seq[(String, Seq[Double])] = movedFloors.map { case (n, _, _) =>
      val samples = (1 to Runs).flatMap { _ =>
        stats.GlobalRank.releaseAll()
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        try { force(SparkEntry.queries(n)(spark, sfDir))
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case _: Throwable => None }
      }
      System.err.println(s"[bench] isolated re-measure $n: " +
        samples.map(s => f"$s%.2f").mkString(", "))
      n -> samples.toSeq
    }
    val qs = times.map { case (k, (m, _, _)) => s"${Json.str(k)}:$m" }.mkString("{", ",", "}")
    val sp = times.map { case (k, (_, lo, hi)) => s"${Json.str(k)}:[$lo,$hi]" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${Json.str(k)}:${Json.str(v)}" }.mkString("{", ",", "}")
    val total = times.map(_._2._1).sum
    // floor = sum of per-query minima: the least-noise estimate of the
    // engine's cost; total-vs-floor gap is measurement noise by definition
    val floor = times.map(_._2._2).sum
    val (cs, ce) = (canaryStart.map(_._2).sum, canaryEnd.map(_._2).sum)
    val drift = if (cs > 0) ce / cs else 1.0
    System.err.println(f"[bench] canary drift ${drift}%.3f (start ${cs}%.1fs end ${ce}%.1fs over ${canaryStart.size} queries)")
    def cjson(p: Seq[(String, Double)]) =
      p.map { case (k, v) => s"${Json.str(k)}:$v" }.mkString("{", ",", "}")
    val canaryJson =
      s"""{"start_total":$cs,"end_total":$ce,"drift":$drift,"start":${cjson(canaryStart)},"end":${cjson(canaryEnd)}}"""
    val (calIoE, calCpuE) = calibrate()
    System.err.println(f"[bench] calib end io ${calIoE}%.2fs cpu ${calCpuE}%.2fs")
    val calibJson =
      s"""{"io_start":$calIoS,"cpu_start":$calCpuS,"io_end":$calIoE,"cpu_end":$calCpuE}"""
    val movedJson = movedFloors
      .map { case (n, p, c) => s"${Json.str(n)}:[$p,$c]" }.mkString("{", ",", "}")
    val isolatedJson = isolated
      .map { case (n, ss) => s"${Json.str(n)}:[${ss.mkString(",")}]" }
      .mkString("{", ",", "}")
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$sp,"errors":$es,"floor_total":$floor,"canary":$canaryJson,"calib":$calibJson,"floor_moved":$movedJson,"isolated":$isolatedJson,"protocol":"warmup-all + discarded canary settle lap (r15) + median-of-$Runs isolated-cache measures","sf":${Json.str(sfDir)}}"""

    // Per-query detail to a file (the full line is ~9 KB at 149 queries
    // and overflowed the driver's 2000-char stdout capture in round 6).
    val detailOk =
      try {
        val w = new java.io.PrintWriter(detailPath, "UTF-8")
        try w.println(full) finally w.close()
        true
      } catch { case _: Throwable => false }

    println(full) // full detail first, for whole-stdout consumers
    // Compact machine-readable summary as the FINAL stdout line — this is
    // what a tail-truncating capture must still parse.
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":${Json.str(sfDir)},"n":${times.size},"error_count":${errors.size},"floor_total":$floor,"drift":$drift,"detail":${if (detailOk) Json.str(detailPath) else "null"}}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
