package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Round-8 query entries: trained-model corpus curation. */
object SparkEntryR8 {

  // x36b hyperparameters — shared by the Spark fit and the generated
  // DuckDB oracle so the two engines replay identical rounds.
  private val Buckets = 1024
  private val Thresh = 60
  private val Rounds = 20
  private val EtaDen = 20000L
  private val BiasCnt = 10L

  // x52 hyperparameter: merge rounds. Shared by the Spark fit and the
  // generated DuckDB oracle so both engines replay identical rounds.
  private val BpeRounds = 12

  private def bpeMerges(s: SparkSession, d: String): Seq[graft.ml.Bpe.Merge] =
    graft.ml.Bpe.ensureMerges(s,
      graft.ml.Bpe.wordCounts(Tables.documents(s, d), "text"),
      BpeRounds, Seq(d, Tables.stamp(d, "documents")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- X52: BPE tokenizer training (oracle-checked merge learning) ----
    //
    // Learns the first `BpeRounds` byte-pair merges from the corpus word
    // frequency table (graft.ml.Bpe) — the tokenizer-fit stage x44's pair
    // counts led up to. Every round is integer counting + deterministic
    // argmax + a literal rewrite, so the DuckDB oracle replays the whole
    // loop as an unrolled CTE chain and matches exactly: an oracle-checked
    // TRAINING loop over the vocabulary, not a scorer. Merges persist via
    // ArtifactStore keyed by the corpus fixture stamp.
    "x52_bpe_train" -> ((s, d) => {
      val m = bpeMerges(s, d)
      import s.implicits._
      m.map(x => (x.round, x.pair, x.merged, x.cnt))
        .toDF("round", "pair", "merged", "cnt")
    }),

    // ---- X52b: tokenize with the learned merges ----
    //
    // Serving path: the R learned rewrites applied over the DISTINCT word
    // table only (vocabulary-keyed compute — at 100 TB the vocabulary is
    // millions of rows where the corpus is billions), then per-word
    // sub-token counts broadcast-joined back to the exploded corpus and
    // summed per document. Non-alphabetic words are outside the BPE
    // alphabet and excluded on both sides.
    "x52b_bpe_tokenize" -> ((s, d) => {
      import graft.ml.Bpe
      val m = bpeMerges(s, d)
      val docs = Tables.documents(s, d)
      val words = docs
        .where(length(trim(col("text"))) > 0)
        .select(col("doc_id"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
        .where(col("word").rlike("^[a-z]+$"))
      val wtoks = words.select(col("word")).distinct()
        .select(col("word"),
          Bpe.seqLen(Bpe.applyMerges(Bpe.charSeq(col("word")), m)).as("n"))
      val perDoc = words
        .join(broadcast(wtoks), "word")
        .groupBy("doc_id").agg(sum("n").as("n"))
      docs.select(col("doc_id"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n"), lit(0L)).cast("bigint").as("n_bpe_tokens"))
    }),

    // ---- X53: mixture rebalancing by deterministic rejection sampling ----
    //
    // Corpus-curation step: downsample every language stratum to (about)
    // the smallest stratum's size so the training mixture is balanced —
    // per-stratum keep rate `max(1, 1000·min_cnt div cnt)` per-mill, and
    // each doc's keep/drop decided by a salted portable rolling hash of
    // its id (no RNG: same corpus → same sample on any engine; a
    // different salt draws an independent sample). Scale shape: one
    // partial-aggregable stratum count (|langs| rows), broadcast back,
    // then a row-local hash draw — the corpus is never shuffled.
    "x53_mixture_rebalance" -> ((s, d) => {
      import graft.text.TextOps
      val docs = Tables.documents(s, d)
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("cnt"))
      val keep = counts
        .crossJoin(broadcast(counts.agg(min(col("cnt")).as("mc"))))
        .select(col("lang"), greatest(lit(1L), expr("1000 * mc div cnt")).as("keep_pm"))
      docs.join(broadcast(keep), "lang")
        .where(TextOps.saltedDraw(col("doc_id").cast("string"), "x53", 1000L)
          < col("keep_pm"))
        .select(col("doc_id"), col("lang"), col("keep_pm"))
    }),

    // ---- X54: leakage-safe train/val/test split ----
    //
    // A hash split keyed by doc_id (x9_hash_split) leaks NEAR-DUPLICATES
    // across splits: two re-crawls of one page land in train and test and
    // the eval is contaminated. The curation-grade split keys the hash by
    // the near-dup CONNECTED COMPONENT instead — every member of a dup
    // cluster (including transitive chains A~B~C) lands in the same
    // split; isolated docs key by their own id. Reuses the PERSISTED
    // x2_dedup_cc label artifact (same corpus, same key → the propagation
    // loop never re-runs), so the marginal cost is one broadcast-ish
    // label join + a row-local hash. The DuckDB oracle recomputes true
    // components with WITH RECURSIVE over exact Jaccard — a green row
    // proves LSH recall, the fixpoint, AND the component-keyed split.
    "x54_leakage_safe_split" -> ((s, d) => {
      import graft.text.TextOps
      val docs = SparkEntryExt.docsWithChain(s, d)
      val labels = TextOps.ensureCcLabels(
        TextOps.nearDupPairs(docs, 0.8).select("id_a", "id_b"),
        Seq(d, Tables.stamp(d, "documents"), "chain_mod4", 0.8, 3, 24, 12, 2))
        .withColumnRenamed("id", "doc_id")
      val h = TextOps.saltedDraw(col("grp").cast("string"), "x54", 10L)
      docs.join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("grp"))
        .select(col("doc_id"), col("grp"),
          when(h < 7, "train").when(h < 9, "val").otherwise("test").as("split"))
    }),

    // ---- X56: HTML → text extraction ----
    //
    // The web-ingest front step (trafilatura-class, regex tier): strip
    // tags, decode the five standard entities, collapse whitespace,
    // pull the <title>. Row-local regex/replace chains — codegen'd, zero
    // shuffle, trivially partition-parallel at any scale. The fixture
    // has no HTML, so the page is PLANTED deterministically around each
    // doc's text (title from the id, a nav div with entities) and the
    // op must recover exactly the original text + the planted title —
    // the oracle proves extraction fired, not that text passed through
    // (the x5_redact_pii discipline). Both engines build the identical
    // page, so the comparison is engine-exact.
    "x56_html_extract" -> ((s, d) => {
      val page = concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit("</title></head><body><p>"), col("text"),
        lit("</p><div class=\"nav\">home &amp; about &lt;here&gt;</div></body></html>"))
      val tagless = regexp_replace(page, "<[^>]*>", " ")
      // decode order matters: &amp; LAST, so '&amp;lt;' never double-decodes
      val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&amp;" -> "&")
        .foldLeft(tagless) { case (c, (e, ch)) => replace(c, lit(e), lit(ch)) }
      val clean = trim(regexp_replace(decoded, " +", " "))
      Tables.documents(s, d).select(
        col("doc_id"),
        regexp_extract(page, "<title>([^<]*)</title>", 1).as("title"),
        clean.as("clean_text"),
        when(length(clean) === 0, lit(0L))
          .otherwise(size(split(clean, " ")).cast("bigint")).as("n_tokens"))
    }),

    // ---- X59: ANN via the PERSISTED incremental vector index ----
    //
    // x4_ivf_topk's serving twin for a continuously-ingested corpus:
    // the postings table is a durable artifact built once and extended
    // by O(batch) appends under the frozen quantizer; queries probe the
    // persisted postings only (a partition-pruned nProbe/nCells read at
    // scale — the corpus parquet is never rescanned). Approximate by
    // design → no SQL oracle; `VectorIndexSpec` pins append==rebuild and
    // exact agreement with the direct ivfTopK on every (q, id, rank).
    "x59_vector_index_topk" -> ((s, d) => {
      import graft.sim.{SimSearch, VectorIndex}
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), SimSearch.castD(col("embedding")).as("emb"))
      val cents = graft.util.ArtifactStore.getOrCompute(s, "ivf_centroids",
        Seq(d, Tables.stamp(d, "embeddings"), 16, 3),
        graft.util.ArtifactStore.CentroidsCodec) {
        SimSearch.fitCentroids(e, 16, iters = 3)
      }
      val idx = VectorIndex.ensureIndex(s, e,
        Seq(d, Tables.stamp(d, "embeddings"), 16, 3), cents)
      VectorIndex.queryTopK(idx, e.filter(col("vec_id") < 10), 10, cents,
        nProbe = 6)
        .select(col("q_id"), col("rank"), col("vec_id"),
          round(col("sim"), 6).as("sim6"))
    }),

    // ---- X58: mixture recipe planner ----
    //
    // The PLANNER whose output x49's epoch executor consumes: given the
    // per-source token census, emit the per-mill repeat factor that
    // equalizes every source's token share at (total div n_sources) —
    // factors > 1000 upsample small sources, < 1000 downsample large
    // ones (the SlimPajama/DoReMi recipe shape). One corpus-scale token
    // count collapsing to a |sources|-row frame; the division is
    // all-integer so the recipe is engine-exact. factor floor 1 keeps
    // every source represented.
    "x58_mix_plan" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("source"),
          when(length(trim(col("text"))) === 0, lit(0L))
            .otherwise(size(split(trim(col("text")), "\\s+")).cast("bigint"))
            .as("n"))
        .groupBy("source").agg(sum("n").as("tokens"))
      tok
        .crossJoin(broadcast(tok.agg(
          sum(col("tokens")).as("total"), count(lit(1)).as("ns"))))
        .select(col("source"), col("tokens"),
          greatest(lit(1L),
            expr("(1000 * (total div ns)) div tokens")).as("factor_pm"))
    }),

    // ---- X57: distinctive keywords per source (c-TF-IDF class) ----
    //
    // Dataset-card keyword extraction: treat each source as one mega-doc
    // (Grootendorst's c-TF-IDF framing), weight each term by frequency ×
    // rarity across sources, keep the top 5 per source. All-integer
    // weight `tf · 1000000 div df` (df = number of sources carrying the
    // term) so the ranking is engine-exact — a float idf's last-ulp
    // would flip tie-adjacent ranks between engines. Scale shape: one
    // corpus-scale token shuffle collapses to the (source, term) table;
    // df is a second agg of that REDUCED table; the top-5 window
    // partitions by source — never a corpus-owning sort.
    "x57_source_keywords" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tf = Tables.documents(s, d)
        .where(length(trim(col("text"))) > 0)
        .select(col("source"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
        .where(col("term").rlike("^[a-z]+$"))
        .groupBy("source", "term").agg(count(lit(1)).as("tf"))
      val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val scored = tf.join(df_, "term")
        .select(col("source"), col("term"),
          expr("tf * 1000000 div df").as("score"))
      val w = Window.partitionBy("source")
        .orderBy(col("score").desc, col("term").asc)
      scored.withColumn("rank", row_number().over(w).cast("int"))
        .where(col("rank") <= 5)
        .select(col("source"), col("rank"), col("term"), col("score"))
    }),

    // ---- X55: transition-graph authority (integer PageRank) ----
    //
    // Markov-chain importance of event types from the user navigation
    // graph — the authority-scoring machinery a crawl-frontier /
    // domain-quality prior needs, at product-analytics scale here. One
    // corpus-scale stage (user-keyed lag window → transition counts),
    // then 10 power-iteration rounds over the node²-bounded edge
    // aggregate as a single lazy plan (no driver collects — the round
    // count is fixed). All-integer ppm arithmetic: the DuckDB oracle
    // replays the identical rounds unrolled and matches bit-for-bit.
    "x55_event_pagerank" -> ((s, d) => {
      import graft.ml.PageRank
      val ev = Tables.events(s, d)
      val ranks = PageRank.ranks(
        ev.select(col("event_type")).distinct(), "event_type",
        PageRank.transitions(ev, "user_id", "event_type", "ts", "event_id"),
        rounds = 10)
      ranks.select(col("node").as("event_type"), col("pr"))
    }),

    // ---- X36b: TRAINED hashed linear quality classifier ----
    //
    // x36's serving path with LEARNED weights: integer batch GD over the
    // hashed bag-of-words features (graft.ml.HashedLogit — per-round
    // gradient is one groupBy into <= buckets+1 rows, the Lloyd-rounds
    // pattern), weights persisted via ArtifactStore keyed by the corpus
    // fixture stamp, scoring one compiled codegen kernel pass
    // (HashedBagWeightedScore). Training is ALL-INTEGER fixed-point
    // (hard-sigmoid logistic), so the DuckDB oracle replays the same
    // rounds as an unrolled CTE chain and matches bit-for-bit — an
    // oracle-checked TRAINING loop, not just an oracle-checked scorer.
    // Teacher here: token-count >= Thresh (any integer label plugs in).
    "x36b_trained_classifier" -> ((s, d) => {
      import org.apache.spark.sql.graft.ColumnBridge.{column => ccol, expression => cexp}
      import graft.expressions.HashedBagWeightedScore
      import graft.text.TextOps
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val w = graft.ml.HashedLogit.ensureWeights(s, docs, "doc_id", "text",
        Buckets, Thresh, Rounds, EtaDen, BiasCnt,
        Seq(d, Tables.stamp(d, "documents")))
      docs.select(col("doc_id"),
          ccol(HashedBagWeightedScore(cexp(TextOps.tokens(col("text"))), w, BiasCnt))
            .as("score"))
        .select(col("doc_id"), col("score"),
          when(col("score") > 0, 1).otherwise(0).as("keep"))
    }))

  def oracleSql: Map[String, String] = Map(
    "x36b_trained_classifier" ->
      graft.ml.HashedLogit.oracleSql(Buckets, Thresh, Rounds, EtaDen, BiasCnt),
    "x53_mixture_rebalance" ->
      s"""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS cnt
         |           FROM documents GROUP BY 1),
         |m AS (SELECT min(cnt) AS mc FROM c),
         |k AS (SELECT lang, GREATEST(1, 1000 * m.mc // c.cnt) AS keep_pm FROM c, m)
         |SELECT doc_id, lang, keep_pm
         |FROM (SELECT d.doc_id, d.lang, k.keep_pm,
         |             'x53:' || CAST(d.doc_id AS VARCHAR) AS t
         |      FROM documents d JOIN k USING (lang))
         |WHERE ${graft.text.TextOps.saltedDrawSql("t", 1000L)} < keep_pm""".stripMargin,
    "x54_leakage_safe_split" -> {
      s"""WITH RECURSIVE all_docs AS (${SparkEntryExt.docsWithChainSql}),
         |sh AS (
         |  SELECT doc_id, list_distinct(${SparkEntryExt.shinglesSql("tk")}) AS s
         |  FROM (SELECT doc_id, ${SparkEntryExt.toksSql} AS tk FROM all_docs)
         |),
         |p AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE len(a.s) > 0 AND len(b.s) > 0
         |    AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |          / len(list_distinct(a.s || b.s)) >= 0.8
         |),
         |e AS (SELECT id_a AS s, id_b AS t FROM p
         |      UNION SELECT id_b, id_a FROM p),
         |cc(id, r) AS (
         |  SELECT DISTINCT s, s FROM e
         |  UNION
         |  SELECT e.t, cc.r FROM cc JOIN e ON e.s = cc.id
         |),
         |lab AS (SELECT id, MIN(r) AS label FROM cc GROUP BY id),
         |g AS (SELECT d.doc_id, COALESCE(l.label, d.doc_id) AS grp
         |      FROM all_docs d LEFT JOIN lab l ON l.id = d.doc_id)
         |SELECT doc_id, grp,
         |       CASE WHEN h < 7 THEN 'train' WHEN h < 9 THEN 'val'
         |            ELSE 'test' END AS split
         |FROM (SELECT doc_id, grp,
         |             ${graft.text.TextOps.saltedDrawSql(
                          "'x54:' || CAST(grp AS VARCHAR)", 10L)} AS h
         |      FROM g)""".stripMargin
    },
    "x56_html_extract" ->
      """WITH pg AS (
        |  SELECT doc_id,
        |         '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
        |         '</title></head><body><p>' || text ||
        |         '</p><div class="nav">home &amp; about &lt;here&gt;</div></body></html>'
        |           AS page
        |  FROM documents),
        |cl AS (
        |  SELECT doc_id, page,
        |         trim(regexp_replace(
        |           replace(replace(replace(replace(replace(
        |             regexp_replace(page, '<[^>]*>', ' ', 'g'),
        |             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |             '&#39;', ''''), '&amp;', '&'),
        |           ' +', ' ', 'g')) AS clean_text
        |  FROM pg)
        |SELECT doc_id,
        |       regexp_extract(page, '<title>([^<]*)</title>', 1) AS title,
        |       clean_text,
        |       CASE WHEN length(clean_text) = 0 THEN CAST(0 AS BIGINT)
        |            ELSE CAST(len(string_split(clean_text, ' ')) AS BIGINT)
        |       END AS n_tokens
        |FROM cl""".stripMargin,
    "x58_mix_plan" ->
      """WITH tok AS (
        |  SELECT source, SUM(CASE WHEN trim(text) = '' THEN 0
        |    ELSE len(string_split_regex(trim(text), '\s+')) END) AS tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT SUM(tokens) AS total, CAST(count(*) AS BIGINT) AS ns FROM tok)
        |SELECT source, CAST(tokens AS BIGINT) AS tokens,
        |       CAST(GREATEST(1, (1000 * (total // ns)) // tokens) AS BIGINT)
        |         AS factor_pm
        |FROM tok, tot""".stripMargin,
    "x57_source_keywords" ->
      """WITH tf AS (
        |  SELECT source, term, CAST(count(*) AS BIGINT) AS tf FROM (
        |    SELECT source, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |    FROM documents WHERE trim(text) <> '')
        |  WHERE regexp_matches(term, '^[a-z]+$')
        |  GROUP BY source, term),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
        |sc AS (SELECT source, term, tf * 1000000 // df AS score
        |       FROM tf JOIN df USING (term))
        |SELECT source, rank, term, score FROM (
        |  SELECT source, term, score,
        |         CAST(row_number() OVER (PARTITION BY source
        |              ORDER BY score DESC, term ASC) AS INT) AS rank
        |  FROM sc)
        |WHERE rank <= 5""".stripMargin,
    "x55_event_pagerank" -> graft.ml.PageRank.oracleSql(10),
    "x52_bpe_train" -> graft.ml.Bpe.trainOracleSql(BpeRounds),
    "x52b_bpe_tokenize" -> graft.ml.Bpe.tokenizeOracleSql(BpeRounds))
}
