package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated fixture tables (`TESTDATA.md`).
  *
  * Each table is a single parquet file under `<sfDir>/<name>.parquet`.
  * Reads are schema-on-file (no inference pass — parquet footers carry the
  * schema); Catalyst handles column pruning and filter pushdown, so callers
  * should select/filter on the returned DataFrame rather than pre-trim here.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Cheap content stamp (size + mtime) of a fixture table file, for use
    * in durable-artifact keys: an artifact keyed only by PATH serves
    * stale index data if the file is regenerated in place between
    * sessions — the stamp makes the key change with the file. (Artifact
    * keys must identify IMMUTABLE inputs; this makes "same path, new
    * data" a different key rather than a silent wrong answer.)
    */
  def stamp(sfDir: String, name: String): String = {
    val f = new java.io.File(s"$sfDir/$name.parquet")
    s"${f.length()}-${f.lastModified()}"
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  // primary keys carry measured-uniqueness evidence (ndv == rowcount on
  // the actual file) so rank-join collapses fire on customer/supplier/
  // part self-joins exactly as they do on orders — evidence breadth,
  // one artifact-cached measurement per (file stamp, column)
  def customer(s: SparkSession, d: String): DataFrame  = {
    registerMeasuredUnique(s, d, "customer", "c_custkey")
    table(s, d, "customer")
  }
  def supplier(s: SparkSession, d: String): DataFrame  = {
    registerMeasuredUnique(s, d, "supplier", "s_suppkey")
    table(s, d, "supplier")
  }
  def part(s: SparkSession, d: String): DataFrame      = {
    registerMeasuredUnique(s, d, "part", "p_partkey")
    table(s, d, "part")
  }
  def orders(s: SparkSession, d: String): DataFrame    = {
    // o_custkey is the key real top-n / argmax spellings partition by
    // (x140/x142/x143); its measured count is HIGH at every fixture SF,
    // so registering it is refusal evidence — the keyed-window family's
    // lower-bound reasoning (ndv(k1..kn) >= max ndv(ki)) keeps Spark's
    // hash-clustered Window for composites like (o_custkey, month)
    // instead of wagering on the zero-exchange heal (VERDICT r14 #1).
    registerMeasuredNdv(s, d, "orders", "o_custkey")
    // o_orderkey is the primary key the rank-subquery JOIN spelling
    // pairs on (x145): measured-unique evidence (ndv == rowcount) lets
    // RankJoinRule collapse the self-join to one windowed scan.
    registerMeasuredUnique(s, d, "orders", "o_orderkey")
    table(s, d, "orders")
  }
  def lineitem(s: SparkSession, d: String): DataFrame  = {
    registerMeasuredNdv(s, d, "lineitem", "l_suppkey")
    table(s, d, "lineitem")
  }

  /** Measured-once column ndv, registered as a [[graft.plans.KeyedWindowRule]]
    * session hint — the fixture-dir analogue of catalog `ANALYZE … FOR
    * COLUMNS` (path reads have no CatalogTable, so catalog stats can
    * never prove them). One distinct-count per (fixture stamp, column),
    * persisted through [[graft.util.ArtifactStore]] and memoized per
    * session, so repeat query builds cost a Set lookup. The hint is
    * HONEST evidence in both directions: a measured low count lets
    * `PARTITION BY <column>` heal as a PROVEN plan (no runtime pre-pass),
    * a measured high count keeps Spark's already-parallel hash window
    * instead of an optimistic re-plan that could only add overhead. */
  private val ndvMeasured =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def registerMeasuredNdv(s: SparkSession, d: String,
                                  name: String, column: String): Unit = {
    val memoKey = s"$d/$name/$column/${stamp(d, name)}"
    // memoize the MEASUREMENT only — the hint itself is re-applied on
    // every load (idempotent conf merge): session confs are mutable
    // state anything may reset (a test battery, a conf sweep, a
    // library caller), and a registration that survives only as a
    // memo flag silently loses the evidence for the rest of the
    // session (caught by the r15 full-suite run)
    val v = ndvMeasured.computeIfAbsent(memoKey, _ =>
      graft.util.ArtifactStore.getOrCompute(s, "col_ndv",
        Seq(d, stamp(d, name), name, column),
        graft.util.ArtifactStore.LongsCodec) {
        Seq(table(s, d, name).select(column).distinct().count())
      }.head)
    graft.plans.KeyedWindowRule.registerNdvHint(s, column, v)
  }

  /** Measured-once column UNIQUENESS, registered as a
    * [[graft.plans.RankJoinRule]] session hint when — and only when —
    * the data proves it: `countDistinct(column) == count(*)` on the
    * actual fixture file (persisted through the ArtifactStore under the
    * file stamp, so a regenerated fixture re-measures). Evidence, not
    * declaration: a fixture written with duplicate keys simply never
    * registers, and the rank-join collapse refuses. */
  private val uniqueMeasured =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  private def registerMeasuredUnique(s: SparkSession, d: String,
                                     name: String, column: String): Unit = {
    val memoKey = s"$d/$name/$column/${stamp(d, name)}"
    // measurement memoized, hint re-applied per load — see
    // registerMeasuredNdv for why
    val unique = uniqueMeasured.computeIfAbsent(memoKey, _ => {
      val v = graft.util.ArtifactStore.getOrCompute(s, "col_unique",
        Seq(d, stamp(d, name), name, column),
        graft.util.ArtifactStore.LongsCodec) {
        val t = table(s, d, name)
        Seq(t.select(column).distinct().count(), t.count())
      }
      v.length == 2 && v(0) == v(1) && v(1) > 0L
    })
    // path-scoped: uniqueness changes result multiplicity, so the
    // evidence must name the exact file it was measured on — a
    // same-named column in another parquet may not be unique. A
    // NON-unique re-measure (regenerated fixture, new stamp, same
    // path) WITHDRAWS any stale entry for the path: evidence must
    // track the file it describes in both directions.
    if (unique) graft.plans.RankJoinRule.registerUniqueHint(
      s, column, s"$d/$name.parquet")
    else graft.plans.RankJoinRule.removeUniqueHint(
      s, column, s"$d/$name.parquet")
  }

  /** Normalize `events.ts` to TimestampType whatever the fixture vintage
    * wrote: older driver runs produced parquet TIMESTAMP(NANOS), which
    * Spark's reader rejects unless `spark.sql.legacy.parquet.nanosAsLong
    * =true` (set by our session builders) maps it to LongType nanos —
    * truncate to micros; newer runs write naive micros (`timestamp[us]`,
    * no UTC adjustment), which Spark reads as TIMESTAMP_NTZ — cast to
    * TimestampType, a wall-clock-preserving no-op under our fixed UTC
    * session timezone. Either way the values match how DuckDB (a naive-
    * micros engine) reads the same file.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    registerMeasuredNdv(s, d, "events", "user_id")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = {
    // doc_id uniqueness powers rank-join collapses on the corpus table
    // ("top-n docs per lang by score" written as a self-join)
    registerMeasuredUnique(s, d, "documents", "doc_id")
    table(s, d, "documents")
  }
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
