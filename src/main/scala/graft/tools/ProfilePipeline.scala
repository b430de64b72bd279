package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{BatchPipeline, PipelineConfig}
import graft.tables.Tables

/** Dev-only: phase timings for the pipeline roundtrip queries. */
object ProfilePipeline {
  private def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[prof] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = s"${System.getProperty("java.io.tmpdir")}/graft_prof"
    val rawDir = s"$root/raw"
    val refinedDir = s"$root/refined"

    val bars = Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1995-07-01").cast("timestamp"))
      .groupBy(col("l_returnflag").as("ativo"), col("l_shipdate").as("Date"))
      .agg(max(col("l_extendedprice")).as("Close"),
        sum(col("l_quantity")).cast("long").as("Volume"))

    (1 to 2).foreach { pass =>
      System.err.println(s"--- pass $pass ---")
      t("writeRaw")(BatchPipeline.writeRaw(bars, rawDir, SaveMode.Overwrite))
      val raw = t("readRaw-plan")(BatchPipeline.readRaw(spark, rawDir))
      t("readRaw-count")(raw.count())
      val refined = BatchPipeline.refine(raw)
      t("writeRefined")(BatchPipeline.writeRefined(refined, refinedDir, "2024-01-15"))
      t("register")(BatchPipeline.registerRefined(spark, "graft_prof_rt", refinedDir))
      t("readBack")(spark.read.parquet(refinedDir).count())
      t("catalogRead")(spark.sql("SELECT * FROM graft_prof_rt WHERE ativo='R'").count())
    }
    val files = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum else 1
      walk(new java.io.File(rawDir))
    }
    System.err.println(s"[prof] raw file count: $files")
    spark.stop()
  }
}
