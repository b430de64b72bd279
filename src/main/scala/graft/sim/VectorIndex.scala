package graft.sim

import java.io.File

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.ArtifactStore

/** Persisted, incrementally-maintained IVF index over an embedding corpus
  * — the vector analog of the text-side `MembershipIndex`/`LshIndex`
  * lifecycle, and the missing piece between the one-shot `ivfTopK` and a
  * CONTINUOUS ingest pipeline: new vectors are assigned to their cell and
  * APPENDED to the postings table (no refit, no corpus rescan), and
  * queries probe the persisted postings only.
  *
  * Index layout: a parquet postings table `(cell, vec_id, emb)` under the
  * artifact dir, cell = nearest centroid (1-based, the `assignClusters`
  * argmax). Centroids are the durable `ArtifactStore` centroid artifact
  * the x35/x4 family already maintains — a frozen quantizer: appended
  * batches use the ORIGINAL centroids, so an appended index is
  * bit-identical to a full rebuild over the grown corpus (pinned in
  * `VectorIndexSpec`), the standard IVF maintenance contract (re-fitting
  * the quantizer is a versioned index rebuild, not an append).
  *
  * At 100 TB: postings are cell-partitionable parquet; a query's probe
  * set is `nProbe` cells → a partition-pruned read of nProbe/nCells of
  * the index; an append is O(batch) assignment + an append-only write —
  * the corpus is never rescanned.
  */
object VectorIndex {

  /** (cell, vec_id, emb) postings rows for `vectors` under the frozen
    * `centroids` quantizer.
    */
  def postings(vectors: DataFrame, centroids: Seq[Seq[Double]],
               idCol: String = "vec_id", embCol: String = "emb"): DataFrame =
    SimSearch.assignClusters(vectors, centroids, embCol, nProbe = 1, idCol)
      .select(col("__bucket").cast("int").as("cell"),
        col(idCol), col(embCol))

  private def indexDir(spark: SparkSession, key: Seq[Any]): File =
    ArtifactStore.artifactDir(spark, "vector_index", key)

  /** Load the persisted postings for (corpus, params), building once if
    * absent. `key` must identify the immutable base corpus + the centroid
    * artifact's identity (a different quantizer is a different index).
    */
  def ensureIndex(spark: SparkSession, vectors: => DataFrame, key: Seq[Any],
                  centroids: Seq[Seq[Double]],
                  idCol: String = "vec_id", embCol: String = "emb"): DataFrame = {
    val dir = indexDir(spark, key)
    if (!new File(dir, "_SUCCESS").exists()) {
      val tmp = new File(dir.getParentFile,
        dir.getName + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
      postings(vectors, centroids, idCol, embCol)
        .write.mode(SaveMode.Overwrite).parquet(tmp.getAbsolutePath)
      ArtifactStore.publishDir(tmp, dir)
    }
    spark.read.parquet(dir.getAbsolutePath)
  }

  /** Post-commit maintenance: assign an admitted batch under the SAME
    * frozen centroids and append its postings. Idempotent-for-correctness
    * replay: a duplicated append only duplicates candidate rows, which
    * top-k dedupes by id rank.
    */
  def appendToIndex(spark: SparkSession, batch: DataFrame, key: Seq[Any],
                    centroids: Seq[Seq[Double]],
                    idCol: String = "vec_id", embCol: String = "emb"): Unit = {
    val dir = indexDir(spark, key)
    require(new File(dir, "_SUCCESS").exists(),
      s"no index at $dir — ensureIndex first")
    postings(batch, centroids, idCol, embCol)
      .write.mode(SaveMode.Append).parquet(dir.getAbsolutePath)
  }

  def invalidate(spark: SparkSession, key: Seq[Any]): Unit =
    ArtifactStore.invalidate(spark, "vector_index", key)

  /** Threshold probe against the postings table (the x110b semantic-
    * decontamination shape): every indexed vector whose exact cosine to
    * ANY query vector reaches `tau`, found by probing each query's
    * `nProbe` nearest cells only. Exact re-rank ⇒ PRECISION 1.0 (a
    * reported (vec, max_sim) is a true over-threshold cosine); recall is
    * bounded by the probe set — a near-dup assigned to a cell outside
    * every query's probe list is missed, the standard IVF trade, so
    * callers pin recall per fixture (`DecontamIndexedSpec`). Per-query
    * cost: nProbe/nCells of the index through one equi-join on the cell
    * id — the corpus itself is never scanned, matching the persisted-
    * index discipline of [[queryTopK]].
    *
    * Output: (idCol, max_sim) per flagged indexed vector, max over the
    * probed query set (order-independent fold → engine-exact).
    */
  def queryThreshold(index: DataFrame, queries: DataFrame, tau: Double,
                     centroids: Seq[Seq[Double]], nProbe: Int,
                     idCol: String = "vec_id", embCol: String = "emb"): DataFrame = {
    require(nProbe >= 1 && nProbe <= centroids.size, "nProbe out of range")
    val probes = queries
      .select(col(embCol).as("__qe"),
        explode(graft.util.Expr.bind(
          SimSearch.centroidScores(col(embCol), centroids),
          s => slice(sort_array(zip_with(s,
            sequence(lit(1), lit(centroids.size)).cast("array<double>"),
            (sc, i) => struct((-sc).as("ns"), i.as("idx")))), 1, nProbe)))
          .as("__r"))
      .select(col("__qe"), col("__r.idx").cast("int").as("cell"))
    probes.join(index, Seq("cell"))
      .select(col(idCol), SimSearch.cosine(col("__qe"), col(embCol)).as("sim"))
      .where(col("sim") >= tau)
      .groupBy(col(idCol)).agg(max(col("sim")).as("max_sim"))
  }

  /** ANN top-k against the postings table: each query probes its `nProbe`
    * nearest cells (row-local centroid scoring, the ivfTopK probe shape),
    * the candidate join is an equi-join on the cell id, and exact cosine
    * re-ranks. Self-matches (same id) are excluded.
    */
  def queryTopK(index: DataFrame, queries: DataFrame, k: Int,
                centroids: Seq[Seq[Double]], nProbe: Int,
                idCol: String = "vec_id", embCol: String = "emb"): DataFrame = {
    require(nProbe >= 1 && nProbe <= centroids.size, "nProbe out of range")
    val probes = queries
      .select(col(idCol).as("q_id"), col(embCol).as("__qe"),
        explode(graft.util.Expr.bind(
          SimSearch.centroidScores(col(embCol), centroids),
          s => slice(sort_array(zip_with(s,
            sequence(lit(1), lit(centroids.size)).cast("array<double>"),
            (sc, i) => struct((-sc).as("ns"), i.as("idx")))), 1, nProbe)))
          .as("__r"))
      .select(col("q_id"), col("__qe"), col("__r.idx").cast("int").as("cell"))
    probes.join(index, Seq("cell"))
      .filter(col("q_id") =!= col(idCol))
      .select(col("q_id"), col(idCol),
        SimSearch.cosine(col("__qe"), col(embCol)).as("sim"))
      .transform(df => SimSearch.topKPerQuery(df, k, "q_id", idCol, "sim"))
  }
}
