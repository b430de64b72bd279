package graft.joins

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-shuffled) table layout — the co-located-join technique
  * for fact↔fact joins that recur on the same key: `bucketBy(n, key)`
  * writes each table pre-hash-partitioned into n buckets, and a join of
  * two tables bucketed on the join key with equal bucket counts plans
  * with NO exchange on either side (the scan itself satisfies the
  * distribution requirement). At 100 TB this converts the single biggest
  * shuffle of a recurring orders↔lineitem join into a one-time layout
  * cost amortized over every subsequent query; `sortBy` additionally
  * pre-orders within buckets so the sort-merge join's sort is file-local.
  *
  * Spark only exposes bucketing through the catalog (`saveAsTable`), so
  * the layout lives in the session warehouse.
  */
object BucketedJoin {

  /** Write `df` as a bucketed+sorted catalog table if this session hasn't
    * already: one-time layout cost, then every equi-join on `key` between
    * equally-bucketed tables is exchange-free.
    */
  def ensureBucketedTable(spark: SparkSession, df: DataFrame, table: String,
                          buckets: Int, key: String): Unit =
    if (!spark.catalog.tableExists(table)) {
      // an in-memory catalog forgets tables across JVMs while the
      // warehouse directory survives; the leftover files are unusable as
      // a bucketed table (bucket metadata lives only in the catalog), so
      // clear the stale location and rebuild
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      val stale = new java.io.File(wh, table)
      if (stale.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(stale)
      }
      df.write.bucketBy(buckets, key).sortBy(key)
        .mode(SaveMode.Overwrite).format("parquet").saveAsTable(table)
    }
}
