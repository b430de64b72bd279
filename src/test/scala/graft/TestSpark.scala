package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (suites may run
  * concurrently in the forked test JVM — SparkSession is thread-safe).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      // the library's extension point — native SQL functions + the
      // RangeJoin/GlobalRank auto-rewrites — active exactly as a
      // production session would run it
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // local-FS harness: skip Hadoop CRC shadow files (halves file ops
      // on partitioned writes; checksums are a distributed-FS concern)
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_test_warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val Sf0001 = "/root/testdata/sf0.001"
  val Sf001 = "/root/testdata/sf0.01"
}
