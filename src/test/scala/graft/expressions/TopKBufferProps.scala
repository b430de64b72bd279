package graft.expressions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Pure-JVM properties for the bounded-heap top-k buffer (no Spark
  * session): correctness vs sort-take and merge/split equivalence (the
  * partial-aggregation contract).
  */
object TopKBufferProps extends Properties("TopKBuffer") {

  private val pairs = Gen.listOf(Gen.zip(
    Gen.chooseNum(0.0, 1.0), Gen.chooseNum(0L, 50L)))
  private val ks = Gen.choose(1, 8)

  private def naive(ps: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    ps.sortBy { case (s, i) => (-s, i) }.take(k)

  property("equals sort-take under the (score desc, id asc) order") =
    forAll(pairs, ks) { (ps, k) =>
      val b = new TopKBuffer(k)
      ps.foreach { case (s, i) => b.add(s, i) }
      b.sortedDesc == naive(ps, k)
    }

  property("merge of split halves equals a single pass (partial-agg contract)") =
    forAll(pairs, ks, Gen.choose(0, 100)) { (ps, k, cut) =>
      val (l, r) = ps.splitAt(cut % (ps.size + 1))
      val a = new TopKBuffer(k); l.foreach { case (s, i) => a.add(s, i) }
      val c = new TopKBuffer(k); r.foreach { case (s, i) => c.add(s, i) }
      a.merge(c)
      a.sortedDesc == naive(ps, k)
    }
}
