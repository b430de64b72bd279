package graft.joins

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join without a nested-loop product. A naive
  * `points.join(intervals, p >= start && p < end)` has no equi-key, so
  * Spark plans BroadcastNestedLoopJoin — O(|points| x |intervals|) work
  * and a broadcast of a whole side. Bucketizing turns it into a hash
  * equi-join: each interval is replicated to every fixed-width time
  * bucket it overlaps, each point hashes to exactly one bucket, and the
  * exact predicate filters within the bucket. Shuffle volume is
  * |points| + |intervals| x (len/bucketWidth + 1) fixed-width rows —
  * the standard interval-join shape at any scale. Catalyst still
  * auto-broadcasts the bucketed interval side when it is small.
  */
object RangeJoin {

  /** Inner join of points to the intervals containing them
    * (`start <= p < end`, half-open).
    *
    * @param pointCol    long column on `points` (e.g. epoch micros)
    * @param startCol/endCol long columns on `intervals`, start < end
    * @param bucketWidth bucket size in the time unit; each interval is
    *                    replicated `len/bucketWidth + 1` times — pick it
    *                    near the typical interval length
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val ivb = intervals
      .withColumn("__ib", explode(sequence(
        floor(col(startCol) / bucketWidth).cast("long"),
        floor((col(endCol) - 1) / bucketWidth).cast("long"))))
    val ptb = points.withColumn("__pb",
      floor(col(pointCol) / bucketWidth).cast("long"))
    ptb.join(ivb,
        ptb("__pb") === ivb("__ib") &&
          col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__pb", "__ib")
  }

  /** Interval-OVERLAP join (both sides are intervals, half-open `[s, e)`;
    * overlap iff `a.s < b.e && b.s < a.e`) — the sessions×campaigns /
    * exposure×outcome join shape. Same bucketization discipline: both
    * sides replicate to their covered buckets, overlapping pairs are
    * guaranteed to share at least one bucket (their intersection is
    * non-empty and lies in both cover sets), the exact predicate filters
    * within the bucket, and pairs meeting in several shared buckets
    * collapse via a full-row dedup. Shuffle volume is
    * Σ len/bucketWidth + 1 per side. Callers needing bag semantics must
    * carry unique keys (full-row dedup collapses identical input rows —
    * the keyed-row contract every join here assumes).
    */
  def intervalOverlap(left: DataFrame, leftStart: String, leftEnd: String,
                      right: DataFrame, rightStart: String, rightEnd: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lb = left.withColumn("__lb", explode(sequence(
      floor(col(leftStart) / bucketWidth).cast("long"),
      floor((col(leftEnd) - 1) / bucketWidth).cast("long"))))
    val rb = right.withColumn("__rb", explode(sequence(
      floor(col(rightStart) / bucketWidth).cast("long"),
      floor((col(rightEnd) - 1) / bucketWidth).cast("long"))))
    lb.join(rb,
        lb("__lb") === rb("__rb") &&
          col(leftStart) < col(rightEnd) && col(rightStart) < col(leftEnd))
      .drop("__lb", "__rb")
      .dropDuplicates()
  }
}
