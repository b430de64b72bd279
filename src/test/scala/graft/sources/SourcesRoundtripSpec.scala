package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** S8/S9 source-format contracts beyond the oracle round-trips: CSV
  * quoting survives hostile strings, and the JSON reader's malformed-
  * record policy (PERMISSIVE capture vs FAILFAST) behaves as documented —
  * the ingest-hygiene knobs a 100 TB pipeline depends on when a crawler
  * ships it garbage lines.
  */
class SourcesRoundtripSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_test_sources/$name"

  test("CSV round-trip preserves delimiters, quotes, newlines and nulls in values") {
    val dir = tmp("csv_hostile")
    val df = Seq(
      (1L, "plain"),
      (2L, "comma, inside"),
      (3L, "a \"quoted\" word"),
      (4L, "line\nbreak"),
      (5L, null)
    ).toDF("id", "s")
    df.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(df.schema)
      .option("header", "true")
      // multiLine: values containing record delimiters need it on read
      .option("multiLine", "true")
      .csv(dir)
    val a = df.collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    val b = back.collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(b === a, s"CSV round trip lost data: $b vs $a")
  }

  test("JSON PERMISSIVE mode captures malformed lines; FAILFAST refuses them") {
    val dir = tmp("json_malformed")
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/part-000.json"),
      """{"id": 1, "s": "ok"}
        |{"id": 2 "s": "missing comma"}
        |{"id": 3, "s": "also ok"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("_corrupt_record", StringType)))
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .cache() // corrupt-record column requires a materialized read
    try {
      val good = permissive.filter(col("_corrupt_record").isNull)
        .select("id").as[Long].collect().toSet
      val bad = permissive.filter(col("_corrupt_record").isNotNull).count()
      assert(good === Set(1L, 3L), s"good rows misparsed: $good")
      assert(bad === 1L, s"expected 1 corrupt row, got $bad")

      val failfast = spark.read
        .schema(StructType(schema.dropRight(1)))
        .option("mode", "FAILFAST").json(dir)
      val e = intercept[Exception] { failfast.collect() }
      assert(e.getMessage.contains("MALFORMED_RECORD") ||
        e.getMessage.toLowerCase.contains("malformed"),
        s"FAILFAST error not about malformed input: ${e.getMessage}")
    } finally permissive.unpersist()
  }
}
