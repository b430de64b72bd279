package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by alternating LARGE-STAR / SMALL-STAR rounds —
  * the published MapReduce CC algorithm (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC 2014; also the GraphFrames
  * default). Round count is O(log² n) worst-case and ~log₂(diameter) in
  * practice, versus O(diameter) for min-label propagation
  * ([[graft.text.TextOps.minLabelComponents]]): on a chain of length
  * 10⁶ — the shape a per-source crawl ordering or a transitive
  * near-dup chain produces at 100 TB — propagation needs a million
  * equi-join rounds while star contraction needs about twenty. Both
  * formulations shuffle O(|E|) per round with map-side partial mins
  * and carry one-long payloads; this one buys exponentially fewer
  * rounds at the price of a second shuffle per round (two stars).
  *
  * Invariant threaded through every round: edges are kept oriented
  * big→small (`u > v`), each round's output is `distinct()`-deduped,
  * and the fixpoint of (largeStar ∘ smallStar) is a star forest whose
  * centers are component minima — so the final labels are exactly
  * min-id-per-component, the same contract as `minLabelComponents`.
  */
object StarComponents {

  /** Large-star: for every node u of the SYMMETRIZED graph, link each
    * strictly-larger neighbor to m(u) = min(Γ(u) ∪ u). Emitted edges
    * satisfy v > u ≥ m, so orientation big→small is preserved and no
    * self-loops appear.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min(col("v")).as("__mn"))
      .select(col("u"), least(col("u"), col("__mn")).as("m"))
    sym.join(mins, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Small-star: input oriented u > v; for every u, link u and all its
    * (smaller) neighbors to m(u) = min(Γ(u)). Output stays big→small.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("u").agg(min(col("v")).as("m"))
    e.join(mins, "u")
      .where(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m"))
      .unionByName(mins)
      .select(col("u"), col("m").as("v"))
      .distinct()
  }

  private def blocksOf(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }

  /** Min-id component labels for every vertex of the undirected pair
    * relation `(id_a, id_b)`, plus the number of (large+small) rounds it
    * took to converge. Convergence is detected by an exact edge count
    * plus an order-independent xxhash64 checksum of the (already
    * distinct) edge set — one tiny aggregate action per round, which is
    * also what materializes the round's lazy `localCheckpoint` (one job
    * per round, lineage truncated, previous round's blocks unpersisted
    * explicitly — the minLabelComponents discipline).
    */
  def labelsWithRounds(pairs: DataFrame, maxIters: Int = 30): (DataFrame, Int) = {
    val init = pairs
      .select(col("id_a").cast("long").as("a"), col("id_b").cast("long").as("b"))
      .where(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
      .distinct()

    def sig(df: DataFrame): (Long, Option[java.math.BigDecimal]) = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).head()
      (r.getLong(0), Option(r.getDecimal(1)))
    }

    var e = init.localCheckpoint(eager = false)
    var cur = sig(e)
    var it = 0
    var converged = cur._1 == 0L
    while (!converged && it < maxIters) {
      val next = smallStar(largeStar(e)).localCheckpoint(eager = false)
      val ns = sig(next)
      blocksOf(e).foreach(_.unpersist(blocking = false))
      e = next
      converged = ns == cur
      cur = ns
      it += 1
    }

    val nodes = pairs
      .select(col("id_a").cast("long").as("id"))
      .unionByName(pairs.select(col("id_b").cast("long").as("id")))
      .distinct()
    val labels = nodes
      .join(e.select(col("u").as("id"), col("v").as("__lbl")), Seq("id"), "left")
      .select(col("id"), coalesce(col("__lbl"), col("id")).as("label"))
    (labels, it)
  }

  /** Labels only — the drop-in twin of `minLabelComponents`. */
  def labels(pairs: DataFrame, maxIters: Int = 30): DataFrame =
    labelsWithRounds(pairs, maxIters)._1
}
