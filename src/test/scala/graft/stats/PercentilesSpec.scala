package graft.stats

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PercentilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(rows: Seq[(String, Double)], qs: Seq[Double]): Unit = {
    val df = rows.toDF("g", "v")
    val names = qs.indices.map(i => s"q$i")
    val got = Percentiles.exactQuantiles(df, "g", "v", qs, names)
      .collect().map(r => r.getString(0) ->
        names.indices.map(i => r.getDouble(1 + i))).toMap
    val expect = df.groupBy("g")
      .agg(qs.zipWithIndex.head match { case (q, i) =>
        percentile(col("v"), lit(q)).as(s"q$i") },
        qs.zipWithIndex.tail.map { case (q, i) =>
          percentile(col("v"), lit(q)).as(s"q$i") }: _*)
      .collect().map(r => r.getString(0) ->
        names.indices.map(i => r.getDouble(1 + i))).toMap
    assert(got.keySet === expect.keySet)
    got.keySet.foreach { g =>
      got(g).zip(expect(g)).zipWithIndex.foreach { case ((a, b), i) =>
        assert(math.abs(a - b) < 1e-9, s"group $g q=${qs(i)}: $a vs $b")
      }
    }
  }

  test("matches the built-in percentile aggregate across group shapes") {
    // 1-row group, 2-row group, big group, duplicate values, negatives
    val rows =
      Seq(("one", 42.0)) ++
        Seq(("two", 1.0), ("two", 2.0)) ++
        (1 to 1001).map(i => ("big", (1002 - i).toDouble)) ++
        Seq.fill(50)(("dup", 7.0)) ++ Seq(("dup", 8.0)) ++
        (1 to 9).map(i => ("neg", -i.toDouble))
    check(rows, Seq(0.0, 0.25, 0.5, 0.9, 1.0))
  }

  test("parallelism: a single huge group spans many partitions") {
    val df = (1 to 100000).map(i => ("solo", i.toDouble)).toDF("g", "v")
    // explicit partition count: AQE coalesces a 1.6 MB toy frame to one
    // partition (correct by size); the property under test is that the
    // RANGE partitioner splits a lone group when partitions are available
    // — the built-in aggregate can't (one buffer, one thread per group)
    val sorted = df.select(col("g"), col("v"))
      .repartitionByRange(8, col("g"), col("v"))
    val parts = sorted.select(spark_partition_id()).distinct().count()
    assert(parts > 1, s"single group not split: $parts partition(s)")
    val out = Percentiles.exactQuantiles(df, "g", "v",
      Seq(0.5, 0.99), Seq("p50", "p99"), numPartitions = 8).collect().head
    assert(math.abs(out.getDouble(1) - 50000.5) < 1e-9)
    assert(math.abs(out.getDouble(2) - 99000.01) < 1e-6)
  }

  test("null group keys and all-null groups behave like the built-in aggregate") {
    import org.apache.spark.sql.{Row => SRow}
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("g", StringType),
      StructField("v", DoubleType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        SRow(null, 1.0), SRow(null, 3.0),      // null GROUP: still a group
        SRow("allnull", null), SRow("allnull", null), // all-null VALUES
        SRow("mixed", 1.0), SRow("mixed", null), SRow("mixed", 5.0))),
      schema)
    val out = Percentiles.exactQuantiles(df, "g", "v", Seq(0.5), Seq("p50"))
      .collect().map(r => Option(r.getString(0)) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(None) === Some(2.0), "null group must aggregate its values")
    assert(out(Some("allnull")) === None,
      "all-null group must yield a row with null quantiles, not vanish")
    assert(out(Some("mixed")) === Some(3.0), "nulls skipped in rank math")
    assert(out.size === 3)
  }

  test("group key keeps its input type and joins back without casts") {
    import org.apache.spark.sql.types.IntegerType
    val df = (1 to 100).map(i => (i % 5, i.toDouble)).toDF("k", "v")
    val out = Percentiles.exactQuantiles(df, "k", "v", Seq(0.5), Seq("p50"))
    assert(out.schema("k").dataType === IntegerType,
      "output key must carry the input type, not string (VERDICT r4 #6)")
    // the point of the typed key: joining back onto the source needs no cast
    val expect = df.groupBy("k")
      .agg(percentile(col("v"), lit(0.5)).as("p50_builtin"))
    val joined = expect.join(out, Seq("k")).select("k", "p50_builtin", "p50")
      .collect()
    assert(joined.length === 5, "typed join must match every group")
    joined.foreach(r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-9, s"group ${r.getInt(0)}"))
  }

  test("empty input yields an empty frame with the right schema") {
    val df = Seq.empty[(String, Double)].toDF("g", "v")
    val out = Percentiles.exactQuantiles(df, "g", "v", Seq(0.5), Seq("p50"))
    assert(out.columns.toSeq === Seq("g", "p50"))
    assert(out.count() === 0)
  }
}
