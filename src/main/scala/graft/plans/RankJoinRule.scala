package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Plan-normalization rule: collapse the rank-subquery JOIN spelling of
  * top-n-per-group — the third everyday spelling (VERDICT r14 #3;
  * `TopNSubqueryRule` covers the correlated-count form, the direct
  * window form rides Spark's `InferWindowGroupLimit`):
  *
  * {{{
  *   SELECT … FROM t
  *   JOIN (SELECT …, row_number() OVER (PARTITION BY k
  *           ORDER BY v DESC) rn FROM t) r
  *   ON t.uid = r.uid AND r.rn <= n
  * }}}
  *
  * into the one-scan windowed filter
  *
  * {{{
  *   SELECT … FROM (SELECT t.*, row_number() OVER (…) __rn FROM t)
  *   WHERE uid IS NOT NULL AND … AND __rn <= n
  * }}}
  *
  * As written the plan reads `t` TWICE and pays an aggregate-side
  * shuffle plus a join exchange; collapsed it is one scan and one
  * window, and when the rank predicate is a `<=`/`<`/`=` bound Spark's
  * `InferWindowGroupLimit` additionally prunes to n rows per key
  * map-side BEFORE the exchange — at 100 TB, one corpus read with
  * group-limit pruning instead of two reads and a shuffle join.
  *
  * Equivalence needs ONE fact the other spellings get for free: each
  * probe row must match EXACTLY its own copy in the subquery. The join
  * pairs twin columns, so that holds iff some paired column is UNIQUE
  * in the base. Uniqueness is never assumed — it must be MEASURED
  * evidence: [[RankJoinRule.registerUniqueHint]] (table loaders
  * register it when `countDistinct(col) == count(*)`, the same
  * measured-once discipline as the ndv hints), consulted only where
  * the paired column traces to a BASE column of the twin relation
  * through pure renames and filters (both uniqueness-preserving — a
  * subset of distinct values is still distinct; joins/aggregates/unions
  * stop the walk). With a unique pairing the matched row IS the probe
  * row, so:
  *  - every OTHER pairing `t.a = r.a` compares a value with itself —
  *    TRUE unless NULL, so the rewrite emits `a IS NOT NULL` for each
  *    nullable paired column (exactly the join's null-drop);
  *  - every subquery output column equals the probe twin on the
  *    matched row, so the rank side's outputs re-emit probe columns
  *    (exprIds preserved via aliases) and the rank output re-emits the
  *    freshly attached window column;
  *  - the rank predicate transfers verbatim onto the new rank column.
  *
  * `rank()`/`dense_rank()` are tie-deterministic, so the collapse is
  * exact. `row_number()` over a non-total ORDER BY is nondeterministic
  * in ANY engine (the subquery itself may return either tie order);
  * the rewrite picks one valid assignment where the original picked
  * another — the same latitude Spark itself claims for the function.
  *
  * The LEFT/RIGHT OUTER form — "flag the top-n rows" — collapses too
  * (r15): every probe row survives and each rank-side output nulls off
  * the match via `If(matchCond, twin, null)`, where matchCond is the
  * paired-column IS NOT NULLs plus the transferred rank bound; the
  * uniqueness evidence caps matches at one per probe row, so the outer
  * join's multiplicity law (exactly one output row per probe row)
  * holds by construction. The rank side must be the NON-PRESERVED
  * side. A bound-less join (plain "attach a rank via self-join")
  * degenerates to the bare window attach.
  *
  * Guards (refusals keep the join):
  *  - INNER / LEFT OUTER / RIGHT OUTER join with a condition; every
  *    conjunct is either a twin pairing or a predicate over the rank
  *    column alone (any shape: `<= n`, `< n`, `= 1`, `BETWEEN`… —
  *    transferred verbatim);
  *  - the rank side peels as [SubqueryAlias|Project|Filter]* over ONE
  *    Window with exactly one row_number/rank/dense_rank expression;
  *    Project entries are attributes, renames, or the rank column;
  *    Filter conjuncts above the Window reference the rank column only
  *    (other subquery-local filters would break the twin);
  *  - both relations strip to CANONICALLY EQUAL deterministic,
  *    non-streaming subtrees (the `TopNSubqueryRule` twin discipline),
  *    with pure-attribute pass-through Projects peeled positionally;
  *  - at least one pairing column carries the measured uniqueness
  *    evidence — no evidence, no wager: the two-scan join stays, and
  *    PlanLint's `self-join-aggregate`-family finding names it.
  *
  * ON by default; opt out with `spark.graft.rankJoin.rewrite=false`.
  * Registered via `spark.sql.extensions=graft.GraftExtensions`
  * (`injectPlanNormalizationRule`).
  */
case class RankJoinRule(session: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  import RankJoinRule._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!session.conf.get(RewriteConf, "true").toBoolean) plan
    else plan.transformUp {
      case j: Join if (j.joinType == Inner || j.joinType == LeftOuter ||
          j.joinType == RightOuter) && j.condition.nonEmpty =>
        rewrite(j).getOrElse(j)
    }
  }

  private def strip(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, c) => strip(c)
    case v: View => strip(v.child)
    case _ => p
  }

  private def deterministicTree(p: LogicalPlan): Boolean =
    WindowShapes.deterministicTree(p) // one shared contract — see there

  /** Strip SubqueryAlias/View AND Projects whose entries are
    * attributes, renames, or DETERMINISTIC computed aliases (the
    * analyzer's window-extraction `_w0 = k % 5` shape), remembering the
    * rename chain: returns (base, out-attr exprId → base-attr,
    * computed-attr exprId → its definition IN BASE TERMS). Projects
    * only narrow, rename, or define columns, so both maps compose down
    * to base outputs; an entry that cannot resolve to base is simply
    * absent — any reference to it refuses downstream. */
  private def stripToBase(p: LogicalPlan)
      : (LogicalPlan, Map[ExprId, Attribute], Map[ExprId, Expression]) = p match {
    case SubqueryAlias(_, c) => stripToBase(c)
    case v: View => stripToBase(v.child) // temp-view wrapper: same exprIds
    case Project(list, c) if list.forall(_.deterministic) =>
      val (base, below, belowDefs) = stripToBase(c)
      def toBase(e: Expression): Option[Expression] = {
        var ok = true
        val r = e.transformUp {
          case a: AttributeReference =>
            below.get(a.exprId).map(x => x: Expression)
              .orElse(belowDefs.get(a.exprId)) match {
              case Some(x) => x
              case None => ok = false; a
            }
        }
        if (ok) Some(r) else None
      }
      val attrs: Map[ExprId, Attribute] = list.collect {
        case a: AttributeReference => a.exprId -> a
        case al @ Alias(a: AttributeReference, _) => al.exprId -> a
      }.toMap.flatMap { case (id, a) => below.get(a.exprId).map(id -> _) }
      val defs: Map[ExprId, Expression] = list.collect {
        case al @ Alias(e, _) if !e.isInstanceOf[AttributeReference] =>
          toBase(e).map(al.exprId -> _)
      }.flatten.toMap
      (base, attrs, defs)
    case other =>
      (other, other.output.map(a => a.exprId -> a).toMap, Map.empty)
  }

  /** The peeled rank side: (window, rank alias, rank kind is implied,
    * rank-only filter conjuncts in rank-side terms, side output →
    * meaning), where a meaning is either Left(base attr of the window
    * child) or Right(the rank attr). */
  private case class RankSide(win: Window, rankAttr: Attribute,
                              rankFn: WindowExpression,
                              rankFilters: Seq[Expression],
                              outMeaning: Map[ExprId, Either[Attribute, Unit]],
                              baseMap: Map[ExprId, Attribute],
                              defs: Map[ExprId, Expression])

  private def peelRankSide(side: LogicalPlan): Option[RankSide] = {
    // walk down through SubqueryAlias / Project / Filter to the Window
    var filters = Seq.empty[Expression]
    // meaning of each CURRENT-level output exprId, maintained as we
    // descend: starts as identity on the side's outputs
    var meaning: Map[ExprId, ExprId] =
      side.output.map(a => a.exprId -> a.exprId).toMap
    var cur = side
    var steps = 0
    while (steps < 32) {
      steps += 1
      cur match {
        case SubqueryAlias(_, c) => cur = c
        case v: View => cur = v.child
        case Project(list, c) =>
          // refuse COMPUTED entries explicitly (duplicate attribute
          // entries — the analyzer's window-extraction Project emits
          // them — are fine: the map just collapses them)
          if (list.exists {
            case _: AttributeReference => false
            case Alias(_: AttributeReference, _) => false
            case _ => true
          }) return None
          val here: Map[ExprId, ExprId] = list.flatMap {
            case a: AttributeReference => Some(a.exprId -> a.exprId)
            case al @ Alias(a: AttributeReference, _) =>
              Some(al.exprId -> a.exprId)
            case _ => None
          }.toMap
          meaning = meaning.flatMap { case (top, mid) =>
            here.get(mid).map(top -> _)
          }
          cur = c
        case f @ Filter(cond, c) =>
          filters ++= splitConjunctivePredicates(cond)
          cur = c
        case w: Window =>
          // exactly one rank-kind window expression
          val rk = w.windowExpressions match {
            case Seq(al @ Alias(we @ WindowExpression(fn, spec), _))
                if WindowShapes.rankKindOf(fn).exists {
                  case RankKind.RowNumber | RankKind.Rank |
                       RankKind.DenseRank => true
                  case _ => false
                } => Some((al, we))
            case _ => None
          }
          val (alias, we) = rk.getOrElse(return None)
          val (_, baseMap, defs) = stripToBase(w.child)
          // resolve each side output to base column or the rank attr
          val out: Map[ExprId, Either[Attribute, Unit]] =
            meaning.flatMap { case (top, mid) =>
              if (mid == alias.exprId) Some(top -> scala.util.Right(()))
              else baseMap.get(mid).map(a => top -> scala.util.Left(a))
            }
          if (out.size != meaning.size) return None
          // every collected filter is DETERMINISTIC (a rand() sample
          // or any other nondeterministic conjunct is not a rank
          // bound and cannot transfer), NON-EMPTY on references (a
          // constant TRUE is harmless but a nondeterministic
          // zero-reference conjunct is caught by the determinism
          // check), and references the rank column only
          val rankRefs = filters.forall(f => f.deterministic &&
            f.references.toSeq.forall(
              r => meaningIsRank(r.exprId, meaning, alias.exprId)))
          if (!rankRefs) return None
          return Some(RankSide(w, alias.toAttribute, we, filters, out,
            baseMap, defs))
        case _ => return None
      }
    }
    None
  }

  private def meaningIsRank(id: ExprId, meaning: Map[ExprId, ExprId],
                            rankId: ExprId): Boolean =
    // a filter can sit at any level; its refs are either side outputs
    // (mapped by `meaning`) or intermediate attrs — accept when the
    // chain bottoms out at the rank alias
    meaning.get(id).contains(rankId) || id == rankId

  /** Measured-uniqueness walk: `a` traces to a BASE column of a leaf
    * through renames and filters (both preserve distinctness); the
    * session hint set is consulted with the LEAF attribute's own name
    * only — a rename is a claim about the reference, not the data.
    *
    * Uniqueness drives a MULTIPLICITY-changing rewrite, so unlike the
    * perf-only ndv hints its blast radius must be scoped: a
    * PATH-SCOPED entry (`column@@path` — what the table loaders
    * register) matches only when the leaf actually scans that file; a
    * BARE entry matches any leaf column of that name — the explicit
    * caller-vouches-for-the-session mode (tests, notebooks), never
    * what the library registers on its own. */
  private def uniqueProven(a: Attribute, plan: LogicalPlan,
                           uniques: Set[String]): Boolean = plan match {
    case SubqueryAlias(_, c) => uniqueProven(a, c, uniques)
    case v: View => uniqueProven(a, v.child, uniques)
    case Project(list, gc) =>
      list.exists {
        case al @ Alias(at: AttributeReference, _) if al.exprId == a.exprId =>
          uniqueProven(at, gc, uniques)
        case at: AttributeReference if at.exprId == a.exprId =>
          uniqueProven(at, gc, uniques)
        case _ => false
      }
    case Filter(_, gc) => uniqueProven(a, gc, uniques)
    case l: LeafNode if l.outputSet.contains(a) =>
      // match on the LEAF attribute's OWN name only — never the names
      // the column carried through renames: `SELECT other AS key` would
      // otherwise inherit key's evidence for a column that was never
      // measured (an alias is a rename of the REFERENCE, not a claim
      // about the underlying data)
      uniques.contains(a.name) || {
        val leafPaths: Set[String] = l match {
          case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            r.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.rootPaths.map(p =>
                  RankJoinRule.normalizePath(p.toString)).toSet
              case _ => Set.empty
            }
          case _ => Set.empty
        }
        leafPaths.nonEmpty && uniques.exists { u =>
          val at = u.indexOf("@@")
          at > 0 && a.name == u.substring(0, at) &&
            leafPaths.contains(RankJoinRule.normalizePath(u.substring(at + 2)))
        }
      }
    case _ => false
  }

  private def rewrite(j: Join): Option[LogicalPlan] = {
    val uniques = parseUniques(session.conf.get(UniqueHintsConf, ""))
    if (uniques.isEmpty) return None // no evidence, no wager — cheap exit

    // orient: which side peels as the rank subquery? For OUTER joins
    // the rank side must be the NON-PRESERVED side ("flag the top-n
    // rows": every probe row survives, rank columns null off the
    // match) — a preserved rank side would be a different operator
    val outer = j.joinType != Inner
    val oriented: Option[(LogicalPlan, RankSide, Boolean)] = j.joinType match {
      case Inner =>
        peelRankSide(j.right).map(rs => (j.left, rs, false))
          .orElse(peelRankSide(j.left).map(rs => (j.right, rs, true)))
      case LeftOuter => peelRankSide(j.right).map(rs => (j.left, rs, false))
      case RightOuter => peelRankSide(j.left).map(rs => (j.right, rs, true))
      case _ => None
    }
    val (probe, rank, swapped) = oriented.getOrElse(return None)

    if (!deterministicTree(probe) || !deterministicTree(rank.win)) return None
    if (probe.isStreaming || rank.win.isStreaming) return None

    // twin discipline: both sides strip to canonically equal subtrees
    val (probeBase, probeMap, _) = stripToBase(probe)
    val (rankBase, _, _) = stripToBase(rank.win.child)
    if (probeBase.output.length != rankBase.output.length) return None
    if (probeBase.canonicalized != rankBase.canonicalized) return None
    val twin: Map[ExprId, Attribute] =
      rankBase.output.zip(probeBase.output).map {
        case (r, p) => r.exprId -> p
      }.toMap
    // probe OUTPUT attr for a probe-base attr (renames preserved above)
    val probeOut: Map[ExprId, Attribute] = probeMap.map {
      case (top, base) => base.exprId -> probe.output.find(_.exprId == top).get
    }
    def probeTwin(rankBaseAttr: Attribute): Option[Attribute] =
      twin.get(rankBaseAttr.exprId).flatMap(p => probeOut.get(p.exprId))

    // join conjuncts: twin pairings + rank-only predicates
    var pairings = Seq.empty[Attribute] // probe-side paired attrs
    var rankPreds = Seq.empty[Expression] // in rank-side output terms
    val probeIds = AttributeSet(probe.output)
    splitConjunctivePredicates(j.condition.get).foreach { c =>
      c match {
        case EqualTo(a: AttributeReference, b: AttributeReference) =>
          val (pa, ra) =
            if (probeIds.contains(a)) (a, b)
            else if (probeIds.contains(b)) (b, a)
            else return None
          rank.outMeaning.get(ra.exprId) match {
            case Some(scala.util.Left(baseAttr)) if probeTwin(baseAttr).exists(_.exprId == pa.exprId) =>
              pairings :+= pa
            case _ => return None // non-twin pairing (incl. rank = col)
          }
        case other if other.deterministic && other.references.nonEmpty &&
            other.references.toSeq.forall(r =>
              rank.outMeaning.get(r.exprId).contains(scala.util.Right(()))) =>
          rankPreds :+= other
        case _ => return None
      }
    }
    if (pairings.isEmpty) return None
    // rank bound may also live inside the subquery (WHERE rn <= n)
    // no rank bound at all is still the "attach a rank via self-join"
    // spelling — the collapse degenerates to a plain window attach
    // (inner: plus the paired-column IS NOT NULLs; outer: the match
    // condition reduces to those)
    val allRankPreds = rankPreds ++ rank.rankFilters

    // the wager's evidence: some paired probe column is measured-unique
    if (!pairings.exists(uniqueProven(_, probe, uniques)))
      return None

    // ---- rewrite ----
    // twin the window spec onto the probe lineage
    def twinExpr(e: Expression): Option[Expression] = {
      var ok = true
      val r = e.transformUp {
        case a: AttributeReference =>
          (rank.baseMap.get(a.exprId).flatMap(probeTwin) match {
            case some @ Some(_) => some.map(x => x: Expression)
            case None =>
              // the analyzer's extracted computed key (`_w0 = k % 5`):
              // inline its BASE-terms definition, twinning the attrs
              rank.defs.get(a.exprId).flatMap { d =>
                var ok2 = true
                val t = d.transformUp {
                  case b: AttributeReference =>
                    probeTwin(b).getOrElse { ok2 = false; b }
                }
                if (ok2) Some(t) else None
              }
          }) match {
            case Some(x) => x
            case None => ok = false; a
          }
      }
      if (ok) Some(r) else None
    }
    val spec = rank.rankFn.windowSpec
    val newPart = spec.partitionSpec.map(e => twinExpr(e).getOrElse(return None))
    val newOrder = spec.orderSpec.map { so =>
      twinExpr(so).getOrElse(return None).asInstanceOf[SortOrder]
    }
    val newFn = twinExpr(rank.rankFn.windowFunction).getOrElse(return None)
    val newAlias = Alias(WindowExpression(newFn,
      WindowSpecDefinition(newPart, newOrder, spec.frameSpecification)),
      "__graft_rankjoin")()
    val win = Window(Seq(newAlias), newPart, newOrder, probe)

    // rank predicates in terms of the NEW rank column; paired nullable
    // columns must be non-null (the join's own null-drop)
    val rankSubst: Expression => Expression = _.transformUp {
      case a: AttributeReference
          if rank.outMeaning.get(a.exprId).contains(scala.util.Right(())) ||
            a.exprId == rank.rankAttr.exprId =>
        newAlias.toAttribute
    }
    val notNulls = pairings.filter(_.nullable).map(IsNotNull(_): Expression)
    val matchConds = notNulls ++ allRankPreds.map(rankSubst)

    // INNER: non-matching rows drop — a Filter (none needed when every
    // pairing is non-nullable and no rank bound exists: full match).
    // OUTER ("flag the top-n rows"): every probe row survives and each
    // rank-side output nulls off the match via If — at most one match
    // per probe row (the uniqueness evidence), so multiplicity is 1
    // either way, exactly the outer join's law.
    val body: LogicalPlan =
      if (outer || matchConds.isEmpty) win
      else Filter(matchConds.reduce(And), win)
    val matched: Option[Expression] =
      if (!outer || matchConds.isEmpty) None else Some(matchConds.reduce(And))

    // emit the join's output columns: probe side as-is, rank side via
    // twins (exprIds preserved so parents keep resolving)
    def offMatch(e: Expression, o: Attribute): Expression = matched match {
      case Some(c) => If(c, e, Literal(null, o.dataType))
      case None => e
    }
    val rankSideOutput = (if (swapped) j.left else j.right).output
    val rankCols: Seq[NamedExpression] = rankSideOutput.map { o =>
      rank.outMeaning(o.exprId) match {
        case scala.util.Right(()) =>
          Alias(offMatch(newAlias.toAttribute, o), o.name)(
            exprId = o.exprId, qualifier = o.qualifier)
        case scala.util.Left(baseAttr) =>
          val p = probeTwin(baseAttr).getOrElse(return None)
          Alias(offMatch(p, o), o.name)(exprId = o.exprId, qualifier = o.qualifier)
      }
    }
    val probeCols: Seq[NamedExpression] = probe.output
    val outList =
      if (swapped) rankCols ++ probeCols else probeCols ++ rankCols
    Some(Project(outList, body))
  }
}

object RankJoinRule {
  /** ON by default; set false to keep the two-scan join plan. */
  val RewriteConf = "spark.graft.rankJoin.rewrite"

  /** Session uniqueness hints: comma-separated column names (bare or
    * `table.column`-scoped — matched against every name the column
    * carries on the lineage walk). Register MEASURED evidence only. */
  val UniqueHintsConf = "spark.graft.uniqueCols"

  def parseUniques(s: String): Set[String] =
    s.split(',').iterator.map(_.trim).filter(_.nonEmpty).toSet

  /** Record measured uniqueness for `column` — called by table loaders
    * after verifying `countDistinct(column) == count(*)` on the actual
    * data (the ndv-hint discipline: evidence, never declaration). The
    * BARE form vouches for every leaf column of that name in the
    * session (tests/notebooks); pass `path` to scope the evidence to
    * one file — what the library's own loaders always do, because a
    * same-named column in a DIFFERENT file may not be unique and this
    * hint changes result multiplicity, not just the plan's cost.
    * Either way the name must be the LEAF column's OWN name: a rename
    * (`SELECT _1 AS id` — every tuple-Dataset `toDF`) never inherits
    * evidence, because the identical shape is also how a non-unique
    * column would wear a registered name. */
  def registerUniqueHint(spark: SparkSession, column: String): Unit =
    registerEntry(spark, column)

  def registerUniqueHint(spark: SparkSession, column: String,
                         path: String): Unit =
    registerEntry(spark, s"$column@@${normalizePath(path)}")

  private def registerEntry(spark: SparkSession, entry: String): Unit = {
    val merged = parseUniques(spark.conf.get(UniqueHintsConf, "")) + entry
    spark.conf.set(UniqueHintsConf, merged.mkString(","))
  }

  /** Withdraw the path-scoped evidence for (column, path) — called by
    * table loaders when a RE-MEASURE (new file stamp at the same path)
    * finds the column no longer unique: a stale entry would keep
    * collapsing joins on a file that now holds duplicates, the exact
    * wrong-multiset hazard the scoping exists to prevent. */
  def removeUniqueHint(spark: SparkSession, column: String,
                       path: String): Unit = {
    val entry = s"$column@@${normalizePath(path)}"
    val remaining = parseUniques(spark.conf.get(UniqueHintsConf, "")) - entry
    spark.conf.set(UniqueHintsConf, remaining.mkString(","))
  }

  /** Scheme-stripped absolute path, so `file:/x/y` and `/x/y` compare
    * equal between registration and the scan's rootPaths. */
  def normalizePath(p: String): String = {
    val noScheme = if (p.startsWith("file:")) p.substring(5) else p
    try new java.io.File(noScheme).getAbsolutePath
    catch { case _: Throwable => noScheme }
  }
}
