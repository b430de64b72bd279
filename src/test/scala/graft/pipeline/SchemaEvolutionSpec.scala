package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Write-side schema evolution through the catalog (VERDICT r9 #5):
  * ALTER TABLE ADD COLUMNS must evolve the table schema in place — old
  * partitions keep their files untouched and read NULL-filled, new
  * partitions carry the column, DESCRIBE reflects the evolution, and
  * the partition key still prunes. The spec replays the full sequence
  * on its own fixture (the s13 entry memoizes its registration, so the
  * pre-ALTER states are only observable here).
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): (String, java.io.File) = {
    val id = java.util.UUID.randomUUID().toString.take(8)
    val dir = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_evo_spec/$id")
    dir.mkdirs()
    (s"graft_evo_spec_$id", dir)
  }

  private def describeCols(t: String): Seq[(String, String)] =
    spark.sql(s"DESCRIBE TABLE $t")
      .filter(!col("col_name").startsWith("#") &&
        length(trim(col("col_name"))) > 0)
      .select("col_name", "data_type").as[(String, String)].collect().toSeq

  test("ALTER ADD COLUMNS: old partitions read NULL-filled, new carry values") {
    val (t, dir) = freshTable()
    try {
      // v1 writer: two rows without volume under era=1
      Seq(("A", 1.0), ("B", 2.0)).toDF("ativo", "close")
        .write.parquet(s"$dir/era=1")
      spark.sql(s"""CREATE TABLE $t (ativo STRING, close DOUBLE, era INT)
                   |USING PARQUET PARTITIONED BY (era)
                   |LOCATION '${dir.getAbsolutePath}'""".stripMargin)
      spark.catalog.recoverPartitions(t)
      // pre-evolution: no volume column anywhere
      assert(!describeCols(t).exists(_._1 == "volume"))

      spark.sql(s"ALTER TABLE $t ADD COLUMNS (volume BIGINT)")
      // v2 writer lands era=2 WITH the column
      Seq(("A", 3.0, 30L), ("C", 4.0, 40L)).toDF("ativo", "close", "volume")
        .write.parquet(s"$dir/era=2")
      spark.catalog.recoverPartitions(t)
      spark.catalog.refreshTable(t)

      // DESCRIBE reflects the evolution: volume in the data schema,
      // before the partition column
      val cols = describeCols(t)
      assert(cols.contains(("volume", "bigint")),
        s"evolved schema missing volume: $cols")
      assert(cols.map(_._1).indexOf("volume") <
        cols.map(_._1).indexOf("era"))

      // old partition: files untouched, NULLs surfaced via the catalog
      val rows = spark.table(t)
        .select("ativo", "close", "volume", "era")
        .collect().map(r => (r.getString(0), r.getDouble(1),
          Option(r.get(2)), r.getInt(3))).toSet
      assert(rows === Set(
        ("A", 1.0, None, 1), ("B", 2.0, None, 1),
        ("A", 3.0, Some(30L), 2), ("C", 4.0, Some(40L), 2)))
      // and the era=1 parquet files really do NOT carry the column
      assert(!spark.read.parquet(s"$dir/era=1").columns.contains("volume"))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
    }
  }

  test("the evolved partition key still prunes era=1 reads") {
    val (t, dir) = freshTable()
    try {
      Seq(("A", 1.0)).toDF("ativo", "close").write.parquet(s"$dir/era=1")
      Seq(("B", 2.0, 20L)).toDF("ativo", "close", "volume")
        .write.parquet(s"$dir/era=2")
      spark.sql(s"""CREATE TABLE $t (ativo STRING, close DOUBLE, era INT)
                   |USING PARQUET PARTITIONED BY (era)
                   |LOCATION '${dir.getAbsolutePath}'""".stripMargin)
      spark.catalog.recoverPartitions(t)
      spark.sql(s"ALTER TABLE $t ADD COLUMNS (volume BIGINT)")
      spark.catalog.refreshTable(t)
      val q = spark.table(t).where(col("era") === 1)
      val scan = q.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters") && scan.contains("era"),
        s"era filter must prune partitions:\n${scan.take(1200)}")
      assert(q.count() === 1L)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
    }
  }

  test("the s13 entry reads the evolved table with era-1 NULL fill") {
    val df = graft.SparkEntry.queries("s13_schema_evolution_catalog")(
      spark, TestSpark.Sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val (era1, era2) = rows.partition(_.getLong(4) == 1L)
    assert(era1.nonEmpty && era2.nonEmpty)
    assert(era1.forall(_.isNullAt(3)), "pre-evolution rows must read NULL volume")
    assert(era2.forall(!_.isNullAt(3)), "post-evolution rows must carry volume")
  }
}
