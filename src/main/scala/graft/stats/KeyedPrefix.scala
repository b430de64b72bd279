package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.etl.MarketEtl

/** Exact per-key PREFIX shapes (running sum, previous value) over
  * LOW-CARDINALITY keys, with the w1b/RollingSufStats adaptive bucketing
  * discipline: `PARTITION BY key` windows put each key's whole
  * corpus-proportional slice through ONE task — with 3 return flags the
  * parallelism is 3 at any cluster size. When the bucketing stats prove
  * every (key, month|year) group holds data, the frame re-buckets on
  * (key, bucket): parallelism #keys × #buckets, results bit-identical.
  *
  * Exactness without float hazards: `runningSum` requires a value whose
  * sums are order-free (integers, or integer-valued doubles under 2^53 —
  * caller's contract, matching the repo's integer-sufficient-statistics
  * discipline), so prior-bucket totals + within-bucket running sums
  * associate freely. `lagValue` moves VALUES across bucket boundaries,
  * exact for any type.
  *
  * Bucketed `runningSum` plan: one exchange+sort on (keys, bucket) for
  * the within-bucket running sum; per-bucket totals from a groupBy that
  * reuses the window partitioning; prior-bucket prefix on the tiny
  * per-bucket frame; broadcast-joined back. `lagValue`: the within-
  * bucket lag plus each bucket's LAST row value (struct-max, no second
  * sort) lagged on the tiny frame to seed the next bucket's first row.
  */
object KeyedPrefix {

  /** `sum(valueCol) OVER (PARTITION BY keys ORDER BY orderCols ROWS
    * UNBOUNDED PRECEDING)` as `out`, bucket-parallel when provable.
    * Null values count nothing (SQL sum semantics): a prefix whose
    * values are all null yields null.
    */
  def runningSum(df: DataFrame, keys: Seq[String], orderCols: Seq[Column],
                 valueCol: Column, out: String, timeCol: Column,
                 stats: Option[MarketEtl.RollingStats] = None): DataFrame = {
    val st = stats.getOrElse(MarketEtl.rollingStats(df, keys, timeCol))
    bucketOf(st, timeCol) match {
      case None =>
        val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        df.withColumn(out, sum(valueCol).over(w))
      case Some(bucket) =>
        val pc = keys.map(col)
        val bucketKeys = pc :+ col("__bucket")
        val withB = df.withColumn("__bucket", bucket)
        val wFrame = Window.partitionBy(bucketKeys: _*).orderBy(orderCols: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val local = withB.withColumn("__run_loc", sum(valueCol).over(wFrame))
        // tiny frame: one row per (key, bucket); prior = strictly-before
        // buckets' total (null when no prior non-null values)
        val wPrior = Window.partitionBy(pc: _*).orderBy(col("__bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val priors = withB.groupBy(bucketKeys: _*)
          .agg(sum(valueCol).as("__t"))
          .withColumn("__prior", sum(col("__t")).over(wPrior))
          .drop("__t")
        local.join(broadcast(priors), keys :+ "__bucket")
          .withColumn(out,
            when(col("__run_loc").isNull && col("__prior").isNull, lit(null))
              .otherwise(coalesce(col("__run_loc"), lit(0L)) +
                coalesce(col("__prior"), lit(0L))))
          .drop("__bucket", "__run_loc", "__prior")
    }
  }

  /** `lag(valueCol, 1) OVER (PARTITION BY keys ORDER BY orderCols)` as
    * `out`, bucket-parallel when provable. `orderCols` must be plain
    * ASCENDING columns in the bucketed path (the per-bucket last row is
    * taken by struct-max, which needs the lexicographic order to BE the
    * window order); the fallback accepts any order.
    */
  def lagValue(df: DataFrame, keys: Seq[String], orderCols: Seq[Column],
               valueCol: Column, out: String, timeCol: Column,
               stats: Option[MarketEtl.RollingStats] = None): DataFrame = {
    val st = stats.getOrElse(MarketEtl.rollingStats(df, keys, timeCol))
    bucketOf(st, timeCol) match {
      case None =>
        val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
        df.withColumn(out, lag(valueCol, 1).over(w))
      case Some(bucket) =>
        val pc = keys.map(col)
        val bucketKeys = pc :+ col("__bucket")
        val withB = df.withColumn("__bucket", bucket)
        val wOrd = Window.partitionBy(bucketKeys: _*).orderBy(orderCols: _*)
        val local = withB
          .withColumn("__rn", row_number().over(wOrd))
          .withColumn("__lag_loc", lag(valueCol, 1).over(wOrd))
        // each bucket's LAST row value by struct-max (order fields are
        // non-null, so the value field never decides), lagged on the
        // tiny per-bucket frame to seed the NEXT bucket's first row
        val wB = Window.partitionBy(pc: _*).orderBy(col("__bucket"))
        val lasts = withB.groupBy(bucketKeys: _*)
          .agg(max(struct(orderCols :+ valueCol.as("__v"): _*)).as("__last"))
          .withColumn("__prev_last", lag(col("__last.__v"), 1).over(wB))
          .select(bucketKeys :+ col("__prev_last"): _*)
        local.join(broadcast(lasts), keys :+ "__bucket")
          .withColumn(out,
            when(col("__rn") === 1, col("__prev_last"))
              .otherwise(col("__lag_loc")))
          .drop("__bucket", "__rn", "__lag_loc", "__prev_last")
    }
  }

  private def bucketOf(st: MarketEtl.RollingStats,
                       timeCol: Column): Option[Column] = {
    // prefix shapes need only NON-EMPTY existing groups (min >= 1: the
    // boundary borrow is one row / one total per bucket, never n-1 rows)
    // plus actual parallelism gain
    if (st.minMonth >= 1 && st.monthGroups > st.keys)
      Some(date_trunc("month", timeCol))
    else if (st.minYear >= 1 && st.yearGroups > st.keys)
      Some(date_trunc("year", timeCol))
    else None
  }
}
