package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.util.ArtifactStore

/** Unigram-style subword segmenter — the SentencePiece-family sibling of
  * the BPE trainer ([[Bpe]]): a piece VOCABULARY with data-derived costs
  * is fit from the corpus word-frequency table, and each word is
  * segmented by a Viterbi dynamic program that minimizes total piece
  * cost. Where real unigram-LM EM scores pieces with float log-probs
  * (whose last-ulp ties no two engines break identically), this is the
  * engine-exact integer formulation of the same shape:
  *
  *   cost(p)  = 10000 + 1000000 div weighted_count(p)   (all BIGINT)
  *   dp value = Σ (cost(p)·128 + 1)  minimized over segmentations
  *
  * The ·128+1 packing makes the minimum LEXICOGRAPHIC in (total cost,
  * piece count): costs differ by ≥1 ⇒ the 128 gap dominates the ≤12
  * possible piece-count difference, so both engines pick the identical
  * segmentation value with no tie ambiguity. `comb div 128` recovers the
  * cost, `comb % 128` the piece count.
  *
  * Scale shape (the reason this is NOT per-corpus-row work): the fit runs
  * on the WORD FREQUENCY table (one corpus-scale shuffle in
  * [[Bpe.wordCounts]]); the piece table is bounded (alphabet + thresholded
  * 2/3-grams — model state, persisted via [[ArtifactStore]]); serving is a
  * row-local compiled DP per DISTINCT word with the vocabulary riding the
  * plan as a codegen reference object, exactly the
  * `HashedBagWeightedScore` serving pattern. Thresholds are RELATIVE
  * (per-mill of total word mass), so the same code is non-trivial at any
  * fixture vintage or corpus size.
  */
object Unigram {

  val PiecePenalty = 10000L
  val InvScale = 1000000L
  val MaxWordLen = 12
  val MaxPieceLen = 3

  final case class Piece(piece: String, cost: Long)

  /** Word-frequency table restricted to DP-bounded words. */
  def boundedWords(words: DataFrame): DataFrame =
    words.where(length(col("word")) <= MaxWordLen)

  /** Fit the piece vocabulary: every character, plus 2-grams/3-grams whose
    * weighted count clears `max(3, W div 500)` / `max(3, W div 1000)`
    * (W = total word mass). Bounded model state crosses the driver —
    * never corpus data (the Lloyd-rounds discipline).
    */
  def fit(words: DataFrame): Seq[Piece] = {
    val w = boundedWords(words)
    val totRow = w.agg(sum("cnt")).collect()(0)
    val total = if (totRow.isNullAt(0)) 0L else totRow.getLong(0)
    if (total == 0L) return Seq.empty
    val t2 = math.max(3L, total / 500)
    val t3 = math.max(3L, total / 1000)
    def grams(l: Int) = w.where(length(col("word")) >= l)
      .select(explode(expr(
        s"transform(sequence(1, length(word) - ${l - 1}, 1), " +
          s"i -> substring(word, i, $l))")).as("piece"), col("cnt"))
      .groupBy("piece").agg(sum("cnt").as("wcnt"))
    grams(1)
      .unionByName(grams(2).where(col("wcnt") >= t2))
      .unionByName(grams(3).where(col("wcnt") >= t3))
      .select(col("piece"),
        (lit(PiecePenalty) + expr(s"$InvScale div wcnt")).as("cost"))
      .collect().map(r => Piece(r.getString(0), r.getLong(1)))
      .sortBy(_.piece).toSeq
  }

  def ensurePieces(spark: SparkSession, words: => DataFrame,
                   key: Seq[Any]): Seq[Piece] =
    ArtifactStore.getOrCompute(spark, "unigram_pieces", key, PiecesCodec) {
      fit(words)
    }

  object PiecesCodec extends ArtifactStore.Codec[Seq[Piece]] {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema: StructType = StructType(Seq(
      StructField("piece", StringType, nullable = false),
      StructField("cost", LongType, nullable = false)))
    def toRows(t: Seq[Piece]): Seq[Row] = t.map(p => Row(p.piece, p.cost))
    def fromRows(rows: Seq[Row]): Seq[Piece] =
      rows.map(r => Piece(r.getString(0), r.getLong(1))).sortBy(_.piece)
  }

  /** Row-local Viterbi DP (compiled; called from generated code): packed
    * min Σ(cost·128+1) over segmentations, or -1 if the word cannot be
    * segmented from the vocabulary (never happens for words whose chars
    * were in the fit corpus — every character is a piece).
    */
  def combCost(word: UTF8String,
               pieces: java.util.HashMap[String, java.lang.Long]): Long = {
    val s = word.toString
    val n = s.length
    if (n == 0) return 0L
    val dp = new Array[Long](n + 1)
    java.util.Arrays.fill(dp, Long.MaxValue)
    dp(0) = 0L
    var i = 0
    while (i < n) {
      if (dp(i) != Long.MaxValue) {
        var l = 1
        while (l <= MaxPieceLen && i + l <= n) {
          val c = pieces.get(s.substring(i, i + l))
          if (c != null) {
            val cand = dp(i) + c.longValue() * 128L + 1L
            if (cand < dp(i + l)) dp(i + l) = cand
          }
          l += 1
        }
      }
      i += 1
    }
    if (dp(n) == Long.MaxValue) -1L else dp(n)
  }

  def piecesMap(ps: Seq[Piece]): java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](ps.size * 2)
    ps.foreach(p => m.put(p.piece, java.lang.Long.valueOf(p.cost)))
    m
  }

  /** The packed DP value of `word` under the fitted vocabulary, as a
    * Column (whole-stage-codegen friendly — the map is a plan reference
    * object, the DP a compiled static call).
    */
  def combCostCol(word: Column, ps: Seq[Piece]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      UnigramCombCost(
        org.apache.spark.sql.graft.ColumnBridge.expression(word),
        piecesMap(ps)))

  /** DuckDB twin: replays the fit (same thresholds and costs from the
    * same word table) and unrolls the Viterbi DP as `maxWordLen`
    * Bellman-Ford rounds over (word, pos, comb) — extensions expand by
    * candidate piece length FIRST so the piece match is a pure equi-join.
    */
  def oracleSql: String = {
    val dpRounds = (1 to MaxWordLen).map { k =>
      val prev = if (k == 1) "dp0" else s"dp${k - 1}"
      s"""dp$k AS MATERIALIZED (
         |  SELECT word, cnt, pos, MIN(comb) AS comb FROM (
         |    SELECT word, cnt, pos, comb FROM $prev
         |    UNION ALL
         |    SELECT c.word, c.cnt, c.pos + length(p.piece) AS pos,
         |           c.comb + p.cost * 128 + 1 AS comb
         |    FROM (SELECT d.word, d.cnt, d.pos, d.comb,
         |                 substr(d.word, d.pos + 1, t.l) AS sub
         |          FROM $prev d CROSS JOIN (SELECT unnest([1, 2, 3]) AS l) t
         |          WHERE d.pos < length(d.word)) c
         |    JOIN p ON p.piece = c.sub
         |  ) GROUP BY word, cnt, pos)""".stripMargin
    }.mkString(",\n")
    s"""WITH wc AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
       |    SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
       |    FROM documents WHERE trim(text) <> '')
       |  WHERE regexp_matches(word, '^[a-z]+$$') AND length(word) <= $MaxWordLen
       |  GROUP BY word),
       |tot AS (SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS w FROM wc),
       |g1 AS (SELECT piece, CAST(SUM(cnt) AS BIGINT) AS wcnt FROM (
       |    SELECT unnest(list_transform(generate_series(1, length(word)),
       |             i -> substr(word, i, 1))) AS piece, cnt FROM wc)
       |  GROUP BY piece),
       |g2 AS (SELECT piece, CAST(SUM(cnt) AS BIGINT) AS wcnt FROM (
       |    SELECT unnest(list_transform(generate_series(1, length(word) - 1),
       |             i -> substr(word, i, 2))) AS piece, cnt FROM wc)
       |  GROUP BY piece
       |  HAVING SUM(cnt) >= (SELECT GREATEST(3, w // 500) FROM tot)),
       |g3 AS (SELECT piece, CAST(SUM(cnt) AS BIGINT) AS wcnt FROM (
       |    SELECT unnest(list_transform(generate_series(1, length(word) - 2),
       |             i -> substr(word, i, 3))) AS piece, cnt FROM wc)
       |  GROUP BY piece
       |  HAVING SUM(cnt) >= (SELECT GREATEST(3, w // 1000) FROM tot)),
       |p AS MATERIALIZED (
       |  SELECT piece, $PiecePenalty + $InvScale // wcnt AS cost FROM (
       |    SELECT * FROM g1 UNION ALL SELECT * FROM g2
       |    UNION ALL SELECT * FROM g3)),
       |dp0 AS (SELECT word, cnt, 0 AS pos, CAST(0 AS BIGINT) AS comb FROM wc),
       |$dpRounds
       |SELECT word, cnt, CAST(comb // 128 AS BIGINT) AS cost,
       |       CAST(comb % 128 AS BIGINT) AS n_pieces
       |FROM dp$MaxWordLen WHERE pos = length(word) ORDER BY word""".stripMargin
  }
}

/** Packed Viterbi DP value of a word under a fixed piece vocabulary (see
  * [[Unigram.combCost]]). The vocabulary map rides the plan as a codegen
  * reference object — a refreshed fit is a new literal, not a new
  * operator — and the DP runs as one compiled static call inside
  * whole-stage codegen.
  */
case class UnigramCombCost(child: Expression,
                           pieces: java.util.HashMap[String, java.lang.Long])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_unigram_comb_cost"
  override def nullSafeEval(input: Any): Any =
    Unigram.combCost(input.asInstanceOf[UTF8String], pieces)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("pieces", pieces, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.ml.Unigram.combCost($c, $mRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
