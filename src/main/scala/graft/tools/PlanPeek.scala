package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the physical plan of named SparkEntry queries against
  * a fixture dir — the `.explain` iteration loop without a test cycle.
  * Usage: `sbt "runMain graft.tools.PlanPeek [sfDir] q1 q2 ..."` (first
  * arg is a fixture dir if it starts with '/', else sf0.001 is used).
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val (sfDir, names) =
      if (args.nonEmpty && args.head.startsWith("/")) (args.head, args.tail)
      else ("/root/testdata/sf0.001", args)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { q =>
      println(s"==== $q ====")
      println(graft.SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
