package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

case class Evt(id: Long, v: String)

class SnapshotSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(name: String): String = {
    val d = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_snapsink/$name-${System.nanoTime()}")
    d.getAbsolutePath
  }

  private def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 10:00:$s%02d")

  test("replayed batchId is a no-op: content and version chain unchanged") {
    val root = freshRoot("replay")
    val b0 = Seq(Evt(1, "a"), Evt(2, "b")).toDF()
    val b1 = Seq(Evt(3, "c")).toDF()
    assert(SnapshotSink.commitBatch(b0, root, 0L, ts(0)))
    assert(SnapshotSink.commitBatch(b1, root, 1L, ts(1)))
    // at-least-once delivery replays batch 0 — with DIFFERENT (stale)
    // contents even; the committed table must not move
    assert(!SnapshotSink.commitBatch(Seq(Evt(99, "stale")).toDF(), root, 0L, ts(2)))
    val got = SnapshotSink.readCommitted(spark, root)
      .as[Evt].collect().toSet
    assert(got === Set(Evt(1, "a"), Evt(2, "b"), Evt(3, "c")))
    assert(SnapshotSink.commits(spark, root).map(c => (c._1, c._2, c._4)) ===
      Seq((0L, 0L, 2L), (1L, 1L, 1L)))
  }

  test("crash between data write and manifest append: dir invisible, retry commits once") {
    val root = freshRoot("crash")
    assert(SnapshotSink.commitBatch(Seq(Evt(1, "a")).toDF(), root, 0L, ts(0)))
    // simulate the crashed attempt: batch 1's delta dir exists (half-
    // written state) but no manifest row was appended
    Seq(Evt(7, "partial")).toDF().write.mode("overwrite")
      .parquet(s"$root/b=1")
    // uncommitted dir is invisible to readers
    assert(SnapshotSink.readCommitted(spark, root).count() === 1)
    assert(SnapshotSink.commits(spark, root).map(_._1) === Seq(0L))
    // restart retries batch 1 with its real contents: overwrites + commits
    assert(SnapshotSink.commitBatch(Seq(Evt(2, "b"), Evt(3, "c")).toDF(), root, 1L, ts(1)))
    val got = SnapshotSink.readCommitted(spark, root).as[Evt].collect().toSet
    assert(got === Set(Evt(1, "a"), Evt(2, "b"), Evt(3, "c")))
    assert(SnapshotSink.commits(spark, root).map(c => (c._1, c._2)) ===
      Seq((0L, 0L), (1L, 1L)))
  }

  test("end-to-end: streaming query restart from checkpoint does not duplicate") {
    val root = freshRoot("e2e")
    val ckpt = freshRoot("e2e-ckpt")
    implicit val sc = spark.sqlContext

    val in1 = MemoryStream[Evt]
    in1.addData(Evt(1, "a"), Evt(2, "b"))
    val q1 = in1.toDF().writeStream
      .foreachBatch(SnapshotSink.writer(root))
      .option("checkpointLocation", ckpt).start()
    try q1.processAllAvailable() finally q1.stop()

    // "restart": a new query on the SAME checkpoint; sources replay from
    // the last committed offsets, so only the new data forms batch 1
    val in2 = MemoryStream[Evt]
    in2.addData(Evt(1, "a"), Evt(2, "b")) // same offsets 0..1 as before
    in2.addData(Evt(3, "c"))
    val q2 = in2.toDF().writeStream
      .foreachBatch(SnapshotSink.writer(root))
      .option("checkpointLocation", ckpt).start()
    try q2.processAllAvailable() finally q2.stop()

    val got = SnapshotSink.readCommitted(spark, root).as[Evt].collect().toList
    assert(got.size === got.toSet.size, s"duplicated rows: $got")
    assert(got.toSet === Set(Evt(1, "a"), Evt(2, "b"), Evt(3, "c")))
    // monotone contiguous version chain
    val vs = SnapshotSink.commits(spark, root).map(_._2)
    assert(vs === (0L until vs.size.toLong))
  }

  test("concurrent writers: CAS version claim — both batches land, versions dense") {
    // VERDICT r6 #8: two independent writers (disjoint batch-id spaces)
    // commit simultaneously; the exclusive-create on _commits/v=<k>
    // arbitrates — the loser re-reads and retries the next version. Both
    // must land exactly once, versions 0..n dense, no row lost/doubled.
    val root = freshRoot("cas")
    // seed so both racers contend for version 1
    assert(SnapshotSink.commitBatch(Seq(Evt(1, "seed")).toDF(), root, 0L, ts(0)))
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    def racer(batchId: Long, rows: Seq[Evt]) = pool.submit(
      new java.util.concurrent.Callable[Boolean] {
        def call(): Boolean = {
          val df = rows.toDF()
          gate.await(5, TimeUnit.SECONDS)
          SnapshotSink.commitBatch(df, root, batchId, ts(batchId.toInt))
        }
      })
    val f1 = racer(1000L, Seq(Evt(2, "w1")))
    val f2 = racer(2000L, Seq(Evt(3, "w2")))
    gate.countDown()
    assert(f1.get(60, TimeUnit.SECONDS) && f2.get(60, TimeUnit.SECONDS),
      "both concurrent commits must report success")
    pool.shutdown()
    val cs = SnapshotSink.commits(spark, root)
    assert(cs.map(_._2) === Seq(0L, 1L, 2L), s"versions not dense: $cs")
    assert(cs.map(_._1).toSet === Set(0L, 1000L, 2000L))
    val got = SnapshotSink.readCommitted(spark, root).as[Evt].collect().toList
    assert(got.size === 3 && got.toSet ===
      Set(Evt(1, "seed"), Evt(2, "w1"), Evt(3, "w2")))
    // a replay of either racer's batch after the race is still a no-op
    assert(!SnapshotSink.commitBatch(Seq(Evt(9, "stale")).toDF(), root, 1000L, ts(9)))
  }

  test("compactInto folds committed deltas into one TimeTravel snapshot") {
    val root = freshRoot("compact")
    val snap = freshRoot("compact-snap")
    SnapshotSink.commitBatch(Seq(Evt(1, "a")).toDF(), root, 0L, ts(0))
    SnapshotSink.commitBatch(Seq(Evt(2, "b")).toDF(), root, 1L, ts(1))
    val v = SnapshotSink.compactInto(spark, root, snap, ts(2))
    assert(v === 0L)
    val got = graft.tables.TimeTravel.readLatest(spark, snap).as[Evt].collect().toSet
    assert(got === Set(Evt(1, "a"), Evt(2, "b")))
  }
}
