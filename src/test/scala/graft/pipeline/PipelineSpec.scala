package graft.pipeline

import java.io.File
import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end batch pipeline test (VERDICT r1 task 1): synthetic multi-asset
  * raw tree → pipeline → refined layout + golden mm_7d + catalog.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** 10 daily bars each for two assets; Close = 1..10 / 101..110. */
  private def bars = {
    val rows = for {
      (asset, base) <- Seq(("VALE3", 0.0), ("PETR4", 100.0))
      day <- 1 to 10
    } yield (Timestamp.valueOf(f"2024-01-$day%02d 00:00:00"),
      base + day, base + day, base + day, base + day, 1000L + day, asset)
    rows.toDF("Date", "Open", "High", "Low", "Close", "Volume", "ativo")
  }

  test("raw sink lands a Hive ano=/mes=/dia= tree") {
    val rawDir = tmp("raw_layout")
    BatchPipeline.writeRaw(bars, rawDir, SaveMode.Overwrite)
    val d = new File(s"$rawDir/ano=2024/mes=01/dia=05")
    assert(d.isDirectory, s"expected Hive partition dir, got ${d.getPath}")
    // read-back discovers partitions and keeps zero-padded strings
    val back = BatchPipeline.readRaw(spark, rawDir)
    assert(back.count() === 20)
    assert(back.select("mes").distinct().head().getString(0) === "01")

    // a filter on the partition keys prunes at the FILE LISTING, not after
    // the scan — the property that makes raw/ queries O(selected days) at
    // 100 TB. PartitionFilters in the plan + only the matching files read.
    val pruned = back.filter(col("dia") === "05")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("(dia"),
      s"partition filter not pushed to listing:\n$scan")
    assert(pruned.count() === 2) // one row per asset on day 5
  }

  test("dynamic partition pruning: a dim-side filter prunes raw partitions at runtime") {
    // The 100 TB join-on-partition-key path: joining the Hive-partitioned
    // raw tree to a FILTERED dim must inject a dynamicpruning expression
    // into the scan's PartitionFilters, so only the dim-selected partition
    // dirs are listed/read at runtime — static pruning can't do this (the
    // selected keys are only known after the dim filter runs).
    // The injection rule gates on cluster-sized benefit estimates and on
    // dim-side shape: the dim must be a source relation (not a local
    // collection) carrying a selective predicate (equality; a bare
    // boolean attribute does not qualify), and the local fixture's scan
    // estimate is far below the default benefit bar — so the test lowers
    // the gates the same way the bloom-filter pin does.
    val rawDir = tmp("dpp_raw")
    BatchPipeline.writeRaw(bars, rawDir, SaveMode.Overwrite)
    val dimDir = tmp("dpp_dim")
    (1 to 10).map(d => (f"$d%02d", if (d % 2 == 0) "keep" else "drop"))
      .toDF("dia", "tag").write.mode(SaveMode.Overwrite).parquet(dimDir)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    s2.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio",
      "100000")
    s2.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
      "false")
    val fact = BatchPipeline.readRaw(s2, rawDir)
    val dim = s2.read.parquet(dimDir)
    val joined = fact.join(dim.filter(col("tag") === "keep"), Seq("dia"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"no dynamic partition pruning in the scan:\n$plan")
    assert(joined.count() === 10) // 5 even days × 2 assets
  }

  test("e2e: refined layout is per-asset (fixes reference defect), mm_7d has 6 warm-up nulls, date pinned") {
    val rawDir = tmp("e2e_raw")
    val refinedDir = tmp("e2e_refined")
    BatchPipeline.writeRaw(bars, rawDir, SaveMode.Overwrite)
    val out = BatchPipeline.run(spark,
      PipelineConfig(rawDir, refinedDir, processingDate = "2024-01-15"))

    // S5: true partitionBy — each asset gets its own partition (the
    // reference would have written everything under the first asset,
    // ref etl/etl_job.py:147-152)
    for (a <- Seq("VALE3", "PETR4"))
      assert(new File(s"$refinedDir/ativo=$a/data=2024-01-15").isDirectory,
        s"missing refined partition for $a")

    // golden mm_7d: null for first 6 rows per asset, then a 7-row mean;
    // VALE3 closes are 1..10 → mm_7d(day7) = mean(1..7) = 4.0
    val vale = out.filter(col("ativo") === "VALE3").orderBy("date")
      .select("mm_7d").collect().map(r => Option(r.get(0)))
    assert(vale.take(6).forall(_.isEmpty), "first 6 rows must be null (min_periods)")
    assert(vale(6) === Some(4.0))
    assert(vale(9) === Some(7.0))

    // F1: the data partition is the injected processing date everywhere
    assert(out.select("data").distinct().collect().map(_.get(0).toString).toSeq
      === Seq("2024-01-15"))

    // P5: partition keys live in the directory name only — the parquet
    // payload inside a partition dir must not repeat ativo/data (the
    // reference drops them by hand, ref etl/etl_job.py:154-156; Spark's
    // partitionBy subsumes that)
    val leafFile = new File(s"$refinedDir/ativo=VALE3/data=2024-01-15")
      .listFiles().filter(_.getName.endsWith(".parquet")).head
    val payloadCols = spark.read.parquet(leafFile.getAbsolutePath).columns.toSet
    assert(!payloadCols.contains("ativo") && !payloadCols.contains("data"),
      s"partition keys leaked into payload: $payloadCols")
  }

  test("compaction collapses accumulated small files, preserving data and partitions") {
    val dir = tmp("compact")
    // simulate many micro-batch writes: 10 appends of 2 rows each
    import spark.implicits._
    (1 to 10).foreach { i =>
      Seq((i.toLong, "A", i * 1.0), (i.toLong + 100, "B", i * 2.0))
        .toDF("id", "k", "v")
        .repartition(2).write.mode(SaveMode.Append)
        .partitionBy("k").parquet(dir)
    }
    val expect = spark.read.parquet(dir).collect().toSet
    val (before, after) = Compaction.compact(spark, dir, targetBytes = 1L << 30,
      partitionCols = Seq("k"))
    assert(before >= 20, s"fixture should start fragmented, had $before files")
    assert(after == 2, s"expected one file per partition, got $after") // k=A, k=B
    assert(new File(s"$dir/k=A").isDirectory && new File(s"$dir/k=B").isDirectory)
    assert(spark.read.parquet(dir).collect().toSet === expect)
  }

  test("compaction targets file counts per partition and keeps zero-padded dirs (ADVICE r2)") {
    import spark.implicits._
    val dir = tmp("compact_skew")
    // zero-padded ano=/mes= layout with heavy skew: mes=01 gets 12 appends
    // (~60 rows), mes=02 gets one 2-row file
    (1 to 12).foreach { i =>
      (1 to 5).map(j => (i * 10L + j, "2024", "01", s"payload $i $j"))
        .toDF("id", "ano", "mes", "body")
        .coalesce(1).write.mode(SaveMode.Append)
        .partitionBy("ano", "mes").parquet(dir)
    }
    Seq((900L, "2024", "02", "cold a"), (901L, "2024", "02", "cold b"))
      .toDF("id", "ano", "mes", "body")
      .coalesce(1).write.mode(SaveMode.Append).partitionBy("ano", "mes").parquet(dir)
    // read with declared string partitions (the consumer contract under test)
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val declared = StructType(Seq(StructField("id", LongType),
      StructField("body", StringType), StructField("ano", StringType),
      StructField("mes", StringType)))
    val expect = spark.read.schema(declared).parquet(dir).collect().toSet
    val hotBytes = new File(s"$dir/ano=2024/mes=01").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    // target ≈ half the hot partition → hot dir must split, cold dir = 1 file
    val (before, after) = Compaction.compact(spark, dir,
      targetBytes = hotBytes / 2, partitionCols = Seq("ano", "mes"))
    assert(before >= 13)
    def files(p: String) = new File(p).listFiles()
      .filter(_.getName.endsWith(".parquet")).length
    // zero-padded dir names survive: no mes=1 rewrite
    assert(new File(s"$dir/ano=2024/mes=01").isDirectory,
      "zero-padded partition dir must be preserved")
    assert(!new File(s"$dir/ano=2024/mes=1").exists(),
      "partition-type inference must not rewrite the layout")
    assert(files(s"$dir/ano=2024/mes=01") >= 2,
      "hot partition must split into multiple files")
    assert(files(s"$dir/ano=2024/mes=02") === 1,
      "cold partition must compact to exactly one file")
    assert(after === files(s"$dir/ano=2024/mes=01") + files(s"$dir/ano=2024/mes=02"))
    assert(spark.read.schema(declared).parquet(dir).collect().toSet === expect,
      "declared-string-partition readers must see identical data after compaction")
    assert(!new File(dir + "__compact_tmp").exists() &&
      !new File(dir + "__compact_old").exists(), "staging trees cleaned up")
  }

  test("incremental second run only rewrites touched asset partitions") {
    val rawDir = tmp("incr_raw")
    val refinedDir = tmp("incr_refined")
    BatchPipeline.writeRaw(bars, rawDir, SaveMode.Overwrite)
    BatchPipeline.run(spark,
      PipelineConfig(rawDir, refinedDir, processingDate = "2024-01-15"))
    val before = new File(s"$refinedDir/ativo=PETR4/data=2024-01-15")
      .listFiles().map(_.getName).toSet

    // new bars for VALE3 only → dynamic overwrite must not touch PETR4
    val more = Seq((Timestamp.valueOf("2024-01-11 00:00:00"),
      11.0, 11.0, 11.0, 11.0, 1011L, "VALE3"))
      .toDF("Date", "Open", "High", "Low", "Close", "Volume", "ativo")
    BatchPipeline.writeRaw(more, rawDir, SaveMode.Append)
    val hist = BatchPipeline.readRaw(spark, rawDir)
      .filter(col("ativo") === "VALE3")
    BatchPipeline.writeRefined(BatchPipeline.refine(hist), refinedDir,
      "2024-01-15", SaveMode.Overwrite, dynamicOverwrite = true)

    val after = new File(s"$refinedDir/ativo=PETR4/data=2024-01-15")
      .listFiles().map(_.getName).toSet
    assert(after === before, "untouched asset partition must be preserved")
    val vale = spark.read.parquet(refinedDir).filter(col("ativo") === "VALE3")
    assert(vale.count() === 11)
  }

  test("declared-schema read absorbs files with missing columns (defensive ingest)") {
    // the reference normalizes whatever arrives (ref etl_job.py:64-69,
    // 120-121); our equivalent is the declared read schema (absent columns
    // come back null) + the P4 conditional default downstream
    val rawDir = tmp("drift")
    BatchPipeline.writeRaw(bars, rawDir, SaveMode.Overwrite)
    // a later file without ativo or Volume (schema drift)
    Seq((Timestamp.valueOf("2024-02-01 00:00:00"), 7.0))
      .toDF("Date", "Close")
      .write.mode(SaveMode.Append).parquet(s"$rawDir/ano=2024/mes=02/dia=01")
    val back = BatchPipeline.readRaw(spark, rawDir)
    assert(back.count() === 21)
    val drifted = back.filter(col("mes") === "02").head()
    assert(drifted.isNullAt(drifted.fieldIndex("ativo")))
    assert(drifted.isNullAt(drifted.fieldIndex("Volume")))
    assert(drifted.getDouble(drifted.fieldIndex("Close")) === 7.0)
  }

  test("catalog registration: introspection + partition-pruned reads") {
    val rawDir = tmp("cat_raw")
    val refinedDir = tmp("cat_refined")
    BatchPipeline.writeRaw(bars, rawDir, SaveMode.Overwrite)
    BatchPipeline.run(spark, PipelineConfig(rawDir, refinedDir,
      processingDate = "2024-01-15", refinedTable = Some("graft_spec_refined")))

    // the three Athena introspection shapes (ref README.md:274-282)
    assert(spark.sql("SHOW DATABASES").count() >= 1)
    assert(spark.sql("SHOW TABLES").collect()
      .exists(_.getAs[String]("tableName") == "graft_spec_refined"))
    val cols = spark.sql("DESCRIBE TABLE graft_spec_refined")
      .select("col_name").collect().map(_.getString(0))
    assert(cols.contains("mm_7d") && cols.contains("ativo"))

    // partition-pruned catalog read: only the VALE3 partition is scanned
    val q = spark.sql(
      "SELECT count(*) FROM graft_spec_refined WHERE ativo = 'VALE3'")
    assert(q.head().getLong(0) === 10)
    val scan = q.queryExecution.executedPlan.toString()
    assert(scan.contains("PartitionFilters") &&
      scan.contains("ativo"), "filter on ativo must reach partition pruning")
    spark.sql("DROP TABLE graft_spec_refined")
  }
}
