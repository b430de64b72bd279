package graft.pipeline

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-files compaction — the maintenance operator every partitioned
  * lake needs once streaming/incremental writes accumulate: rewrite a
  * parquet directory into ceil(bytes / targetBytes) files, preserving
  * Hive partition columns. (The reference never compacts — its Glue jobs
  * rewrite whole prefixes — but any incremental mode, like our streaming
  * T5b path, produces one file per micro-batch per partition and needs
  * this.)
  *
  * Local-FS staging: write to `<dir>__compact_tmp`, then swap. On a real
  * cluster the same two-phase shape applies with the storage's atomic
  * rename/commit primitive.
  */
object Compaction {

  /** @return (filesBefore, filesAfter) parquet data-file counts */
  def compact(spark: SparkSession, dir: String, targetBytes: Long,
              partitionCols: Seq[String] = Nil): (Int, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val before = parquetFiles(dir)
    val bytes = before.map(_.length()).sum
    val parts = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)

    val tmp = dir.stripSuffix("/") + "__compact_tmp"
    val df = spark.read.parquet(dir)
    val writer =
      if (partitionCols.nonEmpty)
        // one file per (partition value, target-size slice)
        df.repartition(parts, partitionCols.map(df(_)): _*)
          .write.partitionBy(partitionCols: _*)
      else df.repartition(parts).write
    writer.mode(SaveMode.Overwrite).parquet(tmp)

    // swap: remove originals, move compacted tree into place
    deleteRecursively(new File(dir))
    Files.move(Paths.get(tmp), Paths.get(dir), StandardCopyOption.ATOMIC_MOVE)
    (before.length, parquetFiles(dir).length)
  }

  private def parquetFiles(dir: String): Seq[File] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f)
      else Nil
    walk(new File(dir))
  }

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete()
    ()
  }
}
