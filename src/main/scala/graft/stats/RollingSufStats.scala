package graft.stats

import org.apache.spark.sql.{Column, DataFrame, functions => fx}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.etl.MarketEtl

/** Trailing-frame SUFFICIENT STATISTICS (count, Σcents, Σcents²) with the
  * skew-safe bucketing discipline of `MarketEtl.rollingMeanAdaptive` —
  * for rolling z-scores/variance over LOW-CARDINALITY keys, where a plain
  * `PARTITION BY key` window caps parallelism at #keys however large the
  * cluster (w8's shape: 3 return flags own the whole lineitem table).
  *
  * All sums are exact integer arithmetic over scaled cents (values and
  * their squares stay far under 2^53, so the final cast to double is
  * correctly rounded and ORDER-FREE) — which is what makes the bucketed
  * boundary corrections trivially exact: unlike a float fold, slicing
  * the previous bucket's tail and re-summing cannot disagree with the
  * windowed sum, whatever order either side added in.
  *
  * Bucketed plan shape (the `rollingMeanBucketed` single-exchange
  * design): ONE exchange+sort on (keys, month|year bucket) computes the
  * within-bucket frame stats — correct for every row but the first n−1
  * of each bucket — plus per-bucket head/tail value lists (≤ n−1 each)
  * extracted by a groupBy that reuses the window's partitioning; the
  * boundary rows' stats are recomputed on that tiny per-bucket frame
  * from prev-tail ++ own-head slices and broadcast-joined back. The
  * granularity choice is exact, not estimated (min existing-group size
  * ≥ n−1 via `MarketEtl.rollingStats`), falling back to the plain
  * per-key window when bucketing cannot help — identical results on
  * every branch.
  */
object RollingSufStats {

  /** Attach `__n` (frame row count), `__sxc` (Σ cents, long) and `__sxxc`
    * (Σ cents², long) over the trailing `n`-row frame per `keys`, ordered
    * by `orderCols`. `centsCol` must be an integral (long) column; rows
    * with a null cents value count in `__n` but contribute nothing to
    * the sums (SQL aggregate semantics).
    */
  def attach(df: DataFrame, keys: Seq[String], orderCols: Seq[Column],
             centsCol: Column, n: Int, timeCol: Column,
             stats: Option[MarketEtl.RollingStats] = None): DataFrame = {
    val st = stats.getOrElse(MarketEtl.rollingStats(df, keys, timeCol))
    if (st.minMonth >= n - 1 && st.monthGroups > st.keys)
      bucketed(df, keys, orderCols, centsCol, n, date_trunc("month", timeCol))
    else if (st.minYear >= n - 1 && st.yearGroups > st.keys)
      bucketed(df, keys, orderCols, centsCol, n, date_trunc("year", timeCol))
    else plain(df, keys, orderCols, centsCol, n)
  }

  private def frameExprs(centsCol: Column, w: org.apache.spark.sql.expressions.WindowSpec) =
    Seq(count(lit(1)).over(w).as("__n"),
      sum(centsCol).over(w).as("__sxc"),
      sum(centsCol * centsCol).over(w).as("__sxxc"))

  /** The fallback: one window per key — correct at any group size, serial
    * per key. */
  private def plain(df: DataFrame, keys: Seq[String], orderCols: Seq[Column],
                    centsCol: Column, n: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
      .rowsBetween(-(n - 1), 0)
    df.select(col("*") +: frameExprs(centsCol, w): _*)
  }

  private def bucketed(df: DataFrame, keys: Seq[String], orderCols: Seq[Column],
                       centsCol: Column, n: Int, bucket: Column): DataFrame = {
    val pc = keys.map(col)
    val bucketKeys = pc :+ col("__bucket")
    val withB = df.withColumn("__bucket", bucket)
      .withColumn("__c", centsCol)
      .withColumn("__c2", centsCol * centsCol)
    val wOrd = Window.partitionBy(bucketKeys: _*).orderBy(orderCols: _*)
    val wFrame = wOrd.rowsBetween(-(n - 1), 0)
    val wAll = Window.partitionBy(bucketKeys: _*)
    val main = withB
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__sz", count(lit(1)).over(wAll))
      .withColumn("__n_loc", count(lit(1)).over(wFrame))
      .withColumn("__sxc_loc", sum(col("__c")).over(wFrame))
      .withColumn("__sxxc_loc", sum(col("__c2")).over(wFrame))

    // per-bucket boundary value lists, ordered by rn (struct sorts on its
    // first field); null cents ride as explicit zeros so positions hold
    def ranked(cond: Column): Column =
      fx.transform(
        sort_array(collect_list(when(cond,
          struct(col("__rn").as("r"),
            coalesce(col("__c"), lit(0L)).as("c"),
            coalesce(col("__c2"), lit(0L)).as("c2"),
            col("__c").isNull.as("miss"))))),
        e => struct(e.getField("c").as("c"), e.getField("c2").as("c2"),
          e.getField("miss").as("miss")))
    val perBucket = main.groupBy(bucketKeys: _*).agg(
      ranked(col("__rn") <= n - 1).as("__head"),
      ranked(col("__rn") > col("__sz") - (n - 1)).as("__tail"))

    // boundary row rn = i+1 needs the last (n-1-i) of the previous
    // bucket's tail; with no previous bucket the local (truncated) frame
    // IS the true frame and the fix stays null
    val wB = Window.partitionBy(pc: _*).orderBy(col("__bucket"))
    def sumField(arr: Column, f: String): Column =
      aggregate(fx.transform(arr, e => e.getField(f).cast("long")),
        lit(0L), (acc, x) => acc + x)
    val corrections = perBucket
      .withColumn("__ptail", lag(col("__tail"), 1).over(wB))
      .select(bucketKeys :+
        posexplode(fx.transform(col("__head"), (_, i) => {
          val need = lit(n - 1) - i
          val combined = concat(
            slice(col("__ptail"),
              greatest(size(col("__ptail")) - need + 1, lit(1)), need),
            slice(col("__head"), lit(1), i + 1))
          when(size(col("__ptail")) >= need, struct(
            size(combined).cast("long").as("n"),
            // a frame of all-missing values sums to NULL, not 0
            when(fx.exists(combined, e => !e.getField("miss")),
              sumField(combined, "c")).as("sxc"),
            when(fx.exists(combined, e => !e.getField("miss")),
              sumField(combined, "c2")).as("sxxc")))
        })): _*)
      .select(bucketKeys ++ Seq((col("pos") + 1).as("__rn"),
        col("col").as("__fix")): _*)
      .filter(col("__fix").isNotNull)

    main
      .join(broadcast(corrections), keys ++ Seq("__bucket", "__rn"), "left")
      .withColumn("__n", coalesce(col("__fix.n"), col("__n_loc")))
      .withColumn("__sxc",
        when(col("__fix").isNotNull, col("__fix.sxc")).otherwise(col("__sxc_loc")))
      .withColumn("__sxxc",
        when(col("__fix").isNotNull, col("__fix.sxxc")).otherwise(col("__sxxc_loc")))
      .drop("__bucket", "__c", "__c2", "__rn", "__sz",
        "__n_loc", "__sxc_loc", "__sxxc_loc", "__fix")
  }
}
