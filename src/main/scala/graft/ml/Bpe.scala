package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.ArtifactStore

/** Distributed BPE (byte-pair-encoding) tokenizer TRAINING — the merge-rule
  * learning stage of an LLM tokenization pipeline (Sennrich et al. 2016),
  * expressed so the loop itself is oracle-checkable: every round is integer
  * counting + a deterministic argmax + a literal string rewrite, so an
  * independent engine replaying the same rounds derives the identical merge
  * table (the x52 DuckDB oracle does exactly that as an unrolled CTE chain).
  *
  * The industrial-scale formulation: BPE never iterates over the corpus —
  * it iterates over the WORD FREQUENCY TABLE. One corpus-scale shuffle
  * builds `(word, cnt)` for the distinct alphabetic words; every training
  * round then runs on that vocabulary-sized table (explode adjacent symbol
  * pairs → one partial-aggregable groupBy → a single-row argmax collect →
  * a row-local literal `replace`). At 100 TB the vocabulary is millions of
  * rows where the corpus is billions, and round cost is independent of
  * corpus size — the same reason fastBPE/HuggingFace trainers count words
  * first.
  *
  * Symbol sequences are pipe-delimited strings (`"|h|e|l|l|o|"`); a merge
  * of pair (l, r) is `replace(seq, "|l|r|", "|lr|")`. Both Spark and DuckDB
  * scan-and-replace left-to-right without re-matching inside a replacement,
  * so `|a|a|a|` merges to `|aa|a|` in both engines. One deliberate
  * difference from textbook BPE: immediately-consecutive occurrences share
  * a delimiter pipe — `aaaa` merges to `|aa|a|a|` and `abab` to
  * `|ab|a|b|` in the round (the second occurrence lost its leading pipe
  * to the first match) — conservative on runs and tilings, identical in
  * both engines, and later rounds still reach the deferred merges.
  * Occurrences separated by at least one other symbol (`abcab`) all merge
  * in one round. Vocabulary is
  * restricted to purely alphabetic lowercase words so '|' can never occur
  * inside a symbol. Argmax tie-break is (count DESC, pair-string ASC) on
  * the combined `"l|r"` string in BOTH engines — comparing l then r
  * separately would disagree with the combined-string order when one left
  * symbol is a prefix of another.
  */
object Bpe {

  /** Corpus word-frequency table: lowercase whitespace tokens restricted to
    * '^[a-z]+$', counted with multiplicity. The ONE corpus-scale stage.
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .where(length(trim(col(textCol))) > 0)
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .where(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Initial symbol sequence of a word: one symbol per character,
    * pipe-delimited with leading/trailing pipes.
    */
  def charSeq(word: Column): Column =
    concat(lit("|"),
      array_join(expr("transform(sequence(1, length(word), 1), i -> substring(word, i, 1))"), "|"),
      lit("|"))

  /** Adjacent symbol pairs of a sequence, as combined "l|r" strings.
    * Guarded: a single-symbol word yields no pairs (Spark's
    * `sequence(1, 0)` would otherwise count DOWN).
    */
  private def pairsOf(seq: Column): Column = {
    val toks = filter(split(seq, "\\|"), t => t =!= "")
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1, lit(1)),
        i => concat(element_at(toks, i), lit("|"), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
  }

  /** One learned merge: round number, the winning pair ("l|r"), the merged
    * symbol ("lr"), and the pair's corpus count at selection time.
    */
  final case class Merge(round: Int, pair: String, merged: String, cnt: Long)

  /** Learn `rounds` merge rules. Each round: pair counts over the current
    * vocabulary sequences (one groupBy), deterministic argmax
    * (count DESC, pair ASC — a 1-row collect, the Lloyd-rounds discipline:
    * bounded model state crosses the driver, never data), then apply the
    * merge as a literal rewrite. The vocabulary table is persisted and
    * re-persisted every round so round k never replays rounds 1..k-1.
    */
  def fit(words: DataFrame, rounds: Int): Seq[Merge] = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var seqs = words.select(col("word"), col("cnt"),
      charSeq(col("word")).as("seq")).persist(lvl)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    try {
      for (r <- 1 to rounds) {
        val best = seqs
          .select(explode(pairsOf(col("seq"))).as("pair"), col("cnt"))
          .groupBy("pair").agg(sum("cnt").as("c"))
          .orderBy(col("c").desc, col("pair").asc)
          .limit(1).collect()
        if (best.nonEmpty) {
          val pair = best(0).getString(0)
          val merged = pair.replace("|", "")
          merges += Merge(r, pair, merged, best(0).getLong(1))
          val applied = seqs.select(col("word"), col("cnt"),
            replace(col("seq"), lit(s"|$pair|"), lit(s"|$merged|")).as("seq"))
            .persist(lvl)
          applied.count() // materialize before dropping the parent
          seqs.unpersist()
          seqs = applied
        }
      }
      merges.toSeq
    } finally { seqs.unpersist(); () }
  }

  /** Fit-or-load the merge table via the durable artifact store, keyed by
    * fixture stamp + rounds; bench repetitions and fresh JVMs load the
    * R-row table instead of re-running the loop.
    */
  def ensureMerges(spark: SparkSession, words: DataFrame, rounds: Int,
                   key: Seq[Any]): Seq[Merge] =
    ArtifactStore.getOrCompute(spark, "bpe_merges", key :+ rounds,
      MergesCodec) { fit(words, rounds) }

  object MergesCodec extends ArtifactStore.Codec[Seq[Merge]] {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema: StructType = StructType(Seq(
      StructField("round", IntegerType, nullable = false),
      StructField("pair", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false)))
    def toRows(t: Seq[Merge]): Seq[Row] =
      t.map(m => Row(m.round, m.pair, m.merged, m.cnt))
    def fromRows(rows: Seq[Row]): Seq[Merge] =
      rows.map(r => Merge(r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).sortBy(_.round)
  }

  /** Apply a learned merge table to a symbol sequence column: the R
    * rewrites chained in round order, row-local (codegen'd chain of
    * `replace` calls — no joins, no shuffles).
    */
  def applyMerges(seq: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(seq) { (c, m) =>
      replace(c, lit(s"|${m.pair}|"), lit(s"|${m.merged}|"))
    }

  /** Sub-token count of a symbol sequence. */
  def seqLen(seq: Column): Column =
    size(filter(split(seq, "\\|"), t => t =!= "")).cast("bigint")

  // ---------------------------------------------------------------- oracle

  /** DuckDB replay of `fit` + the x52 output: unrolled MATERIALIZED CTE
    * chain (each w_k is referenced by both the next round's pair count and
    * the argmax). Emits (round, pair, merged, cnt) for rounds 1..R.
    */
  /** The s0 seed + R rounds of (pair count, argmax, rewrite) CTEs, shared
    * by both oracles. Assumes a `wc(word, cnt)` CTE is already defined.
    */
  private def chainCtes(rounds: Int): Seq[String] = {
    val seed =
      "s0 AS MATERIALIZED (SELECT word, cnt, '|' || array_to_string(" +
        "list_transform(range(1, length(word)+1), i -> substring(word, i, 1))," +
        " '|') || '|' AS seq FROM wc)"
    val loop = (1 to rounds).flatMap { k =>
      val prev = s"s${k - 1}"
      Seq(
        s"p$k AS MATERIALIZED (SELECT pair, CAST(sum(cnt) AS BIGINT) AS c FROM (" +
          "SELECT cnt, unnest(CASE WHEN len(toks) >= 2 THEN " +
          "list_transform(range(1, len(toks)), i -> toks[i] || '|' || toks[i+1]) " +
          "ELSE [] END) AS pair FROM (SELECT cnt, " +
          s"list_filter(string_split(seq, '|'), t -> t <> '') AS toks FROM $prev)) " +
          "GROUP BY pair)",
        s"b$k AS MATERIALIZED (SELECT pair, c FROM p$k ORDER BY c DESC, pair ASC LIMIT 1)",
        s"s$k AS MATERIALIZED (SELECT word, cnt, replace(seq, " +
          "'|' || b.pair || '|', '|' || replace(b.pair, '|', '') || '|') AS seq " +
          s"FROM $prev CROSS JOIN b$k b)")
    }
    seed +: loop
  }

  def trainOracleSql(rounds: Int): String = {
    val wc =
      "wc AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (" +
        "SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word " +
        "FROM documents WHERE trim(text) <> '') " +
        "WHERE regexp_full_match(word, '[a-z]+') GROUP BY word)"
    val out = (1 to rounds).map { k =>
      s"SELECT $k AS round, pair, replace(pair, '|', '') AS merged, c AS cnt FROM b$k"
    }
    s"""WITH ${(wc +: chainCtes(rounds)).mkString(",\n")}
       |SELECT * FROM (${out.mkString(" UNION ALL ")}) ORDER BY round""".stripMargin
  }

  /** DuckDB replay of tokenization with the learned merges: per-word
    * sub-token counts over the SAME unrolled chain, joined back to the
    * exploded corpus — (doc_id, n_bpe_tokens), non-alphabetic words
    * excluded on both sides.
    */
  def tokenizeOracleSql(rounds: Int): String = {
    // Shares trainOracleSql's chain structure but roots word counts in a
    // doc-keyed token CTE so the final join-back can re-use it.
    val head = Seq(
      "dtok AS MATERIALIZED (SELECT doc_id, word FROM (" +
        "SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word " +
        "FROM documents WHERE trim(text) <> '') " +
        "WHERE regexp_full_match(word, '[a-z]+'))",
      "wc AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS cnt " +
        "FROM dtok GROUP BY word)") ++ chainCtes(rounds)
    val tail =
      s"""wtoks AS MATERIALIZED (SELECT word,
         |  CAST(len(list_filter(string_split(seq, '|'), t -> t <> '')) AS BIGINT)
         |    AS n FROM s$rounds)
         |SELECT d.doc_id,
         |       CAST(COALESCE(t.n, 0) AS BIGINT) AS n_bpe_tokens
         |FROM documents d
         |LEFT JOIN (SELECT doc_id, sum(n) AS n FROM dtok JOIN wtoks USING (word)
         |           GROUP BY doc_id) t
         |  ON d.doc_id = t.doc_id""".stripMargin
    s"WITH ${head.mkString(",\n")},\n$tail"
  }
}
