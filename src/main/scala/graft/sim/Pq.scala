package graft.sim

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.ArtifactStore

/** Product quantization (PQ): the memory-compression leg of the ANN
  * family (brute force → sign-LSH → IVF → PQ). A D-dim vector is split
  * into M subvectors; each subspace gets its own K-centroid codebook, and
  * a vector is stored as M small codes — 64 floats become 8 codes here, a
  * 32× footprint cut. Queries scan the CODES (asymmetric distance: per
  * subspace, a K-entry dot table against the query subvector, summed by
  * code), then the top ADC candidates re-rank by exact cosine against the
  * raw vectors.
  *
  * Scale design:
  *   - the codebook is M×K×(D/M) doubles — a driver-scale artifact,
  *     persisted via `ArtifactStore` exactly like the IVF centroids: fit
  *     once per (table, params), a fresh JVM loads instead of refitting;
  *   - fit is Lloyd-in-DataFrames for ALL subspaces in one job per round
  *     (assignment via native fused dot columns, update via one
  *     posexplode + groupBy mean whose result is M×K×(D/M) rows —
  *     bounded, independent of corpus size);
  *   - encoding and the ADC scan are row-local expressions over the codes
  *     column (the compressed-domain linear scan IS the operator — it
  *     reads 1/32 the bytes of a raw scan and never shuffles the corpus);
  *   - exact re-rank touches only #queries × rerank rows.
  *
  * Approximate by design → rows-only harness entry; recall vs brute force
  * is asserted in `PqSpec`.
  */
object Pq {

  /** codebooks(m)(k) = centroid k of subspace m (dim = D/M). */
  final case class Codebooks(m: Int, k: Int, subDim: Int,
                             tables: Seq[Seq[Seq[Double]]])

  private def subvec(emb: Column, m: Int, subDim: Int): Column =
    slice(emb, m * subDim + 1, subDim)

  /** argmin_k ||x − c_k||² as argmax_k (x·c_k − ||c_k||²/2) — native dot
    * columns + literal half-norm corrections; 1-based code index.
    */
  private def codeFor(emb: Column, m: Int, cents: Seq[Seq[Double]],
                      subDim: Int): Column = {
    val half = cents.map(c => c.map(x => x * x).sum / 2.0)
    val adjusted = graft.util.Expr.bind(
      SimSearch.centroidScores(subvec(emb, m, subDim), cents),
      s => zip_with(s, typedLit(half), (dot, h) => dot - h))
    graft.util.Expr.bind(adjusted, a => array_position(a, array_max(a)))
  }

  /** Plain (non-spherical) per-subspace Lloyd fit; deterministic first-K
    * seeds per subspace; empty clusters keep their previous centroid.
    * One distributed job per round for all M subspaces together.
    */
  def fit(vectors: DataFrame, m: Int, k: Int, iters: Int,
          idCol: String = "vec_id", embCol: String = "emb"): Codebooks = {
    val dim = vectors.select(size(col(embCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val seedRows = vectors.orderBy(col(idCol)).limit(k)
      .select(col(embCol)).collect().map(_.getSeq[Double](0).toIndexedSeq)
    require(seedRows.length == k, s"need >= $k vectors to seed, got ${seedRows.length}")
    var books: Seq[Seq[Seq[Double]]] =
      (0 until m).map(mi => seedRows.map(_.slice(mi * subDim, (mi + 1) * subDim)))
    for (_ <- 0 until iters) {
      val codeCols = (0 until m).map(mi =>
        codeFor(col(embCol), mi, books(mi), subDim).as(s"__c$mi"))
      val assigned = vectors.select(col(embCol) +: codeCols: _*)
        .select(posexplode(col(embCol)).as(Seq("__pos", "__x")) +:
          (0 until m).map(mi => col(s"__c$mi")): _*)
      // component __pos belongs to subspace __pos/subDim; its code column
      // picks the cluster — one flat (m, code, pos) mean aggregate
      val means = assigned
        .withColumn("__m", (col("__pos") / subDim).cast("int"))
        .withColumn("__code",
          element_at(array((0 until m).map(mi => col(s"__c$mi")): _*),
            col("__m") + 1))
        .groupBy(col("__m"), col("__code"), col("__pos"))
        .agg(avg(col("__x")).as("__mean"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getLong(1).toInt))
        .map { case ((mi, code), rows) =>
          (mi, code) -> rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
        }
      books = (0 until m).map(mi => (0 until k).map(ki =>
        means.get((mi, ki + 1)).fold(books(mi)(ki))(identity)))
    }
    Codebooks(m, k, subDim, books)
  }

  /** Load-or-fit via the ArtifactStore index-table lifecycle (flattened
    * codebook round-trips as (idx, vec) rows, same codec as IVF).
    */
  def ensureCodebooks(spark: SparkSession, vectors: DataFrame,
                      tableKey: String, m: Int, k: Int, iters: Int,
                      idCol: String = "vec_id", embCol: String = "emb"): Codebooks = {
    val flat = ArtifactStore.getOrCompute(spark, "pq_codebooks",
      Seq(tableKey, m, k, iters), ArtifactStore.CentroidsCodec) {
      fit(vectors, m, k, iters, idCol, embCol).tables.flatten
    }
    val subDim = flat.head.length
    Codebooks(m, k, subDim, flat.grouped(k).toSeq)
  }

  /** Encode every vector as its M (1-based) subspace codes. */
  def encode(vectors: DataFrame, cb: Codebooks,
             idCol: String = "vec_id", embCol: String = "emb"): DataFrame =
    vectors.select(col(idCol),
      array((0 until cb.m).map(mi =>
        codeFor(col(embCol), mi, cb.tables(mi), cb.subDim)): _*).as("codes"))

  /** ADC + exact re-rank top-k: for each query, scan the codes with its
    * per-subspace dot tables (approximate dot = Σ_m table(m)(code_m)),
    * keep `rerank` candidates by ADC score, then exact-cosine re-rank to
    * the final k. Output: (q_id, rank, vec_id, sim).
    */
  def topK(vectors: DataFrame, queries: DataFrame, cb: Codebooks,
           k: Int, rerank: Int,
           idCol: String = "vec_id", embCol: String = "emb"): DataFrame = {
    require(rerank >= k, "rerank pool must be >= k")
    // per-query ADC tables: table(m)(kk) = q_m · c_(m,kk) — #queries ×
    // M × K doubles, driver-bounded (the query set is small by contract)
    val qRows = queries.select(col(idCol), col(embCol)).collect()
    val qTables: Seq[(Long, Seq[Seq[Double]])] = qRows.map { r =>
      val q = r.getSeq[Double](1)
      val tabs = (0 until cb.m).map { mi =>
        val sub = q.slice(mi * cb.subDim, (mi + 1) * cb.subDim)
        cb.tables(mi).map(c => c.zip(sub).map { case (a, b) => a * b }.sum)
      }
      (r.getLong(0), tabs)
    }.toIndexedSeq
    val codes = encode(vectors, cb, idCol, embCol)
    // explode the literal query-table set per code row: the compressed-
    // domain linear scan (rows = #codes × #queries, each a few flops)
    val qLit = typedLit(qTables.map { case (qid, t) => (qid, t) })
    val adc = codes
      .select(col(idCol), col("codes"), explode(qLit).as("__q"))
      .select(col("__q._1").as("q_id"), col(idCol),
        graft.util.Expr.bind(col("__q._2"), tabs =>
          aggregate(
            zip_with(col("codes"), tabs, (c, t) => element_at(t, c.cast("int"))),
            lit(0.0), (acc, x) => acc + x)).as("__adc"))
      .filter(col("q_id") =!= col(idCol))
    val cand = SimSearch.topKPerQuery(adc, rerank, "q_id", idCol, "__adc")
      .select(col("q_id"), col(idCol))
    // exact re-rank of the small candidate pool
    val qv = queries.select(col(idCol).as("q_id"), col(embCol).as("__qe"))
    val vv = vectors.select(col(idCol), col(embCol).as("__ve"))
    val exact = cand.join(qv, "q_id").join(vv, idCol)
      .select(col("q_id"), col(idCol),
        SimSearch.cosine(col("__qe"), col("__ve")).as("sim"))
    SimSearch.topKPerQuery(exact, k, "q_id", idCol, "sim")
  }
}
