package graft.tools

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Scale-trap linter: the library's own plan-audit discipline
  * (`PlanAuditSpec`'s watchlist — cartesian products, one-task windows,
  * unpushed scan filters) exposed as a USER-facing operator, so a
  * pipeline author can gate a 100 TB submission on `lint(df)` the way
  * this repo's CI gates its own queries.
  *
  * Every check reads the PRE-execution physical plan (under AQE, the
  * initial plan — the shape the cluster would start executing), costs
  * zero jobs, and reports deterministic, exprId-free rows so the output
  * is stable across runs and engines:
  *
  *  - `cartesian-product` (error): `CartesianProductExec` — every pair of
  *    partitions pairs; O(|L|×|R|) at any scale.
  *  - `nested-loop-join` (warn): `BroadcastNestedLoopJoinExec` — a whole
  *    side broadcast + per-row loop; legitimate only for provably tiny
  *    sides (this library's own 1-row scalar attaches), a scale trap
  *    everywhere else.
  *  - `unpartitioned-window` (error): `WindowExec` with no PARTITION BY —
  *    one task sorts and folds the entire input (the shape
  *    `GlobalRankRule` heals when the extensions are active).
  *  - `keyed-window` (info): any surviving `WindowExec` — parallelism is
  *    capped at ndv(keys); in a session with the graft extensions active
  *    a surviving window means the rewrite family REFUSED (high/unproven
  *    ndv or an unsupported frame), which deserves a look at scale.
  *  - `unpushed-scan-filter` (warn): a parquet scan carrying data filters
  *    the source could not translate (`PushedFilters` misses them) — the
  *    predicate runs post-materialization on every row read.
  *  - `shuffle-census` (info): total shuffle-exchange count — the number
  *    a reviewer sanity-checks against the query's minimum.
  *
  * Refusal-free by design: the linter only ever REPORTS (an empty frame
  * is a clean bill), and the findings frame is tiny driver-side metadata
  * — never derived from the data itself.
  */
object PlanLint {

  /** One finding; `node` is the physical operator's class-simple name and
    * `detail` is deterministic (no expression ids, no object hashes).
    */
  case class Finding(rule: String, severity: String, node: String, detail: String)

  /** The pre-execution plan: under AQE, the initial plan (exchanges
    * ensured, no runtime re-planning yet); otherwise the executed plan.
    */
  private def planOf(df: Dataset[_]): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }

  /** Count the filters listed in a scan's `PushedFilters: [...]` metadata
    * (zero for `[]`).
    */
  private def pushedCount(scan: FileSourceScanExec): Int =
    scan.metadata.get("PushedFilters") match {
      case Some(s) =>
        val body = s.stripPrefix("[").stripSuffix("]").trim
        if (body.isEmpty) 0
        // count top-level commas only: And(a,b) etc. nest commas inside
        // parens, and each top-level element is one pushed filter
        else {
          var depth = 0; var n = 1
          body.foreach {
            case '(' => depth += 1
            case ')' => depth -= 1
            case ',' if depth == 0 => n += 1
            case _ =>
          }
          n
        }
      case None => 0
    }

  def findings(df: Dataset[_]): Seq[Finding] = {
    val plan = planOf(df)
    val out = Seq.newBuilder[Finding]
    var shuffles = 0
    plan.foreach {
      case _: CartesianProductExec =>
        out += Finding("cartesian-product", "error", "CartesianProduct",
          "every pair of partitions pairs: O(|left| x |right|) at any scale")
      case j: BroadcastNestedLoopJoinExec =>
        out += Finding("nested-loop-join", "warn", "BroadcastNestedLoopJoin",
          s"${j.joinType.toString.toLowerCase} join with no equi-key; " +
            "whole side broadcast + per-row loop")
      case w: WindowExec if w.partitionSpec.isEmpty =>
        out += Finding("unpartitioned-window", "error", "Window",
          "no PARTITION BY: one task sorts and folds the entire input")
      case w: WindowExec =>
        out += Finding("keyed-window", "info", "Window",
          s"partition keys: ${w.partitionSpec.size}; parallelism capped " +
            "at ndv(keys) and the rewrite family refused this shape")
      case s: FileSourceScanExec =>
        val unpushed = s.dataFilters.size - pushedCount(s)
        if (unpushed > 0)
          out += Finding("unpushed-scan-filter", "warn", "Scan",
            s"$unpushed of ${s.dataFilters.size} scan filter(s) not pushed " +
              "down: predicate runs post-materialization on every row read")
      case _: ShuffleExchangeExec =>
        shuffles += 1
      case _ =>
    }
    out += Finding("shuffle-census", "info", "plan",
      s"$shuffles shuffle exchange(s)")
    out.result().sortBy(f => (f.rule, f.node, f.detail))
  }

  /** Findings as a DataFrame (columns `rule, severity, node, detail`). */
  def lint(df: Dataset[_])(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    findings(df).toDF()
  }

  /** CI-gate form: throw (listing the findings) when any finding at one
    * of the `failOn` severities survives; return the full findings
    * otherwise. `BatchPipeline.run` gates its refined plan on this
    * before writing (opt out with `spark.graft.planLint.gate=false`) —
    * the engine holds its own submissions to the standard its test
    * suite holds the query library to.
    */
  def gate(df: Dataset[_],
           failOn: Set[String] = Set("error")): Seq[Finding] = {
    val fs = findings(df)
    val bad = fs.filter(f => failOn.contains(f.severity))
    if (bad.nonEmpty) throw new org.apache.spark.SparkException(
      "PlanLint gate: the plan contains scale traps:\n" +
        bad.map(f => s"  [${f.severity}] ${f.rule} (${f.node}): ${f.detail}")
          .mkString("\n") +
        "\nFix the plan, or disable the gate with spark.graft.planLint.gate=false.")
    fs
  }

  /** Conf key for the pipeline's pre-write gate. */
  val GateConf = "spark.graft.planLint.gate"
}
