package graft.stats

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exponential weighted moving average over per-key time series — the
  * finance transform the reference's pandas users reach for right after
  * the rolling mean (`ewm(alpha).mean()`), recurrence form
  * `ewma_t = α·x_t + (1−α)·ewma_{t−1}`, seeded `ewma_1 = x_1`.
  *
  * The recurrence is inherently sequential PER KEY, so this is the one
  * shape where typed per-group imperative code is the honest plan (the
  * same judgment as the streaming `flatMapGroupsWithState` rolling
  * state): `groupByKey(key).flatMapGroups` holds ONE key's series in
  * memory, sorted by time, and folds once. The contract is a BOUNDED
  * series per key — daily bars are a few thousand points even over
  * decades (callers aggregate to the day first, as the w7 entry does);
  * unbounded-per-key streams belong to the streaming incremental path.
  *
  * Cross-engine determinism: the fold multiplies and adds in a fixed
  * order (α·x + (1−α)·prev), so an oracle replaying the same recurrence
  * over the same series produces bit-identical doubles.
  */
object Ewma {

  /** The external Java type of a timestamp column varies with session
    * conf (java.sql.Timestamp, java.time.Instant for TIMESTAMP, or
    * java.time.LocalDateTime for TIMESTAMP_NTZ) — sort on an extracted
    * epoch and pass the original value through untouched.
    */
  private def epochMicros(v: Any): Long = v match {
    case t: Timestamp => t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    case i: java.time.Instant =>
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case l: java.time.LocalDateTime =>
      val i = l.toInstant(java.time.ZoneOffset.UTC)
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case other => throw new IllegalArgumentException(
      s"unsupported time value ${other.getClass}")
  }

  /** df must carry (keyCol: String, dtCol: timestamp-like, xCol: Double)
    * with one row per (key, dt). Output: (key, dt, ewma) — dt keeps its
    * input type.
    */
  def perKey(df: DataFrame, alpha: Double, keyCol: String, dtCol: String,
             xCol: String): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha in (0, 1]")
    val in = df.select(col(keyCol).cast("string"), col(dtCol), col(xCol).cast("double"))
    val outSchema = StructType(Seq(
      StructField(keyCol, StringType),
      in.schema(dtCol),
      StructField("ewma", DoubleType, nullable = false)))
    in.groupByKey(_.getString(0))(Encoders.STRING)
      .flatMapGroups { (key: String, rows: Iterator[Row]) =>
        val series = rows.map(r => (r.get(1), r.getDouble(2)))
          .toArray.sortBy(p => epochMicros(p._1))
        var prev = 0.0
        series.iterator.zipWithIndex.map { case ((dt, x), i) =>
          prev = if (i == 0) x else alpha * x + (1.0 - alpha) * prev
          Row(key, dt, prev)
        }
      }(Encoders.row(outSchema))
      .toDF()
  }
}
