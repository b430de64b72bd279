package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XxHash64Function, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled kernels for the text-sketch expressions below. Public static
  * entry points so generated code can call them — the expressions keep
  * whole-stage codegen intact while the loops run as compiled JVM code
  * instead of per-element interpreted lambdas (which dominated the X2
  * sketch queries: MinHash 13.3 s, SimHash 7.2 s at sf0.1).
  */
object TextHashKernels {

  /** Portable 31-bit polynomial rolling hash over CODEPOINTS — exactly
    * `TextOps.rollingHashExpr` (fold (acc*31 + codepoint) mod 2^31-1,
    * empty string → 0), which the DuckDB oracles reproduce.
    */
  def rollingHash31(u: UTF8String): Long = {
    val s = u.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    acc
  }

  /** 31-bit SimHash over the DISTINCT shingle set using `rollingHash31` —
    * bit-for-bit the algorithm of `TextOps.simhash` / the x2_simhash
    * oracle: bit j set iff Σ_distinct-shingles ((h>>j)&1)*2-1 > 0.
    */
  def simHash31(arr: ArrayData): Long = {
    val n = arr.numElements()
    val seen = new java.util.HashSet[UTF8String]()
    val bitSums = new Array[Long](31)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null && seen.add(s)) {
        val h = rollingHash31(s)
        var j = 0
        while (j < 31) {
          bitSums(j) += ((h >> j) & 1L) * 2 - 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 31) {
      if (bitSums(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }

  /** See `WordShingles`. trim() removes spaces only and toLowerCase is
    * UTF8String's — exactly Spark's `trim`/`lower`; the `\s+` split is the
    * same Java regex `functions.split` applies.
    */
  /** X15 repetition metrics in one pass over the token array:
    * dup_frac = 1 − distinct/total tokens (0.0 for empty), and
    * top_bigram_frac = max bigram count / total bigrams (0.0 below 2
    * tokens). Ratio math matches the HOF formulation exactly
    * ((int-derived double) / int in IEEE-754), so oracles are unchanged.
    * Null elements (possible when called from SQL on a hand-built array;
    * `TextOps.tokens` never yields them) count as one shared "null
    * token" — HashSet/HashMap accept the null key, so no crash.
    */
  def repetitionStats(toks: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = toks.numElements()
    val out = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    if (n == 0) { out.update(0, 0.0); out.update(1, 0.0); return out }
    val seen = new java.util.HashSet[UTF8String](n * 2)
    var i = 0
    while (i < n) {
      seen.add(if (toks.isNullAt(i)) null else toks.getUTF8String(i))
      i += 1
    }
    out.update(0, (n - seen.size).toDouble / n)
    if (n < 2) { out.update(1, 0.0); return out }
    def tok(j: Int): String =
      if (toks.isNullAt(j)) null else toks.getUTF8String(j).toString
    val counts = new java.util.HashMap[(String, String), Int](n * 2)
    var best = 0
    i = 0
    while (i + 1 < n) {
      val c = counts.merge((tok(i), tok(i + 1)), 1, Integer.sum)
      if (c > best) best = c
      i += 1
    }
    out.update(1, best.toDouble / (n - 1))
    out
  }

  def wordShingles(u: UTF8String, n: Int): ArrayData = {
    val t = u.trim().toLowerCase().toString
    if (t.isEmpty) return new GenericArrayData(Array.empty[Any])
    val toks = t.split("\\s+")
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** Non-distinct variant: every shingle occurrence in order — the form
    * n-gram COUNTING needs (LM training/scoring), where multiplicity is
    * the whole point. Same tokenization as `wordShingles`.
    */
  def wordShinglesAll(u: UTF8String, n: Int): ArrayData = {
    val t = u.trim().toLowerCase().toString
    if (t.isEmpty) return new GenericArrayData(Array.empty[Any])
    val toks = t.split("\\s+")
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Fused MinHash signature + banded key packing over the distinct
    * shingle set: numHashes min-hashes (xxhash64 of the shingle, re-mixed
    * per hash function), then key[b] = xxhash64-fold of that band's
    * signature slice. Internal bucketing values — no cross-engine contract.
    */
  def minHashBandKeys(arr: ArrayData, numHashes: Int, bands: Int,
                      rowsPerBand: Int): ArrayData = {
    val n = arr.numElements()
    val seen = new java.util.HashSet[UTF8String]()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null && seen.add(s)) {
        val base = XxHash64Function.hash(s, StringType, 42L)
        var h = 0
        while (h < numHashes) {
          val v = XXH64.hashLong(base, h)
          if (v < mins(h)) mins(h) = v
          h += 1
        }
      }
      i += 1
    }
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 1000L + b
      var r = 0
      while (r < rowsPerBand) {
        acc = XXH64.hashLong(mins(b * rowsPerBand + r), acc)
        r += 1
      }
      keys(b) = acc
      b += 1
    }
    new GenericArrayData(keys)
  }

  /** Hashed bag-of-words linear score: Σ_tokens w[rollingHash31(tok) mod
    * buckets], with the integer weight table derived from the bucket id
    * (w(b) = (b·2654435761) mod 1001 − 500 ∈ [−500, 500]). All-integer
    * int64 arithmetic (buckets ≤ 2^16 keeps b·2654435761 < 2^48), so any
    * engine that can hash a token reproduces the score EXACTLY — the
    * hashing-trick feature map of a fastText-style linear classifier with
    * the training externalized to the weight function.
    */
  def hashedBagScore(toks: ArrayData, buckets: Int): Long = {
    val n = toks.numElements()
    var score = 0L
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t != null) {
        val b = rollingHash31(t) % buckets
        score += (b * 2654435761L) % 1001L - 500L
      }
      i += 1
    }
    score
  }

  /** Segment strip against a bounded hash set: keep the elements of
    * `segs` NOT in `hot`, returning (n_seg, n_kept, " "-joined kept
    * text) in one pass. O(1) per segment — the declarative
    * `filter(array_contains(...))` twin is O(|hot|) per segment, which
    * dominates once the hot set grows past a few hundred entries.
    */
  def stripSegments(segs: ArrayData,
                    hot: java.util.HashSet[UTF8String]): InternalRow = {
    val n = segs.numElements()
    val kept = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val s = segs.getUTF8String(i)
      if (s != null && !hot.contains(s)) kept.add(s)
      i += 1
    }
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j < kept.size()) {
      if (j > 0) sb.append(' ')
      sb.append(kept.get(j).toString)
      j += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, kept.size().toLong,
      UTF8String.fromString(sb.toString)))
  }

  /** `hashedBagScore` with a LEARNED weight table instead of the fixed
    * weight function: Σ_tokens w[rollingHash31(tok) mod (len-1)], plus a
    * bias term `biasCnt · w[len-1]` (the last slot is the bias weight —
    * the virtual always-on feature the trainer fits alongside the token
    * buckets). Same all-integer exactness contract.
    */
  def hashedBagScoreWeighted(toks: ArrayData, weights: Array[Long],
                             biasCnt: Long): Long = {
    val buckets = weights.length - 1
    val n = toks.numElements()
    var score = biasCnt * weights(buckets)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t != null) score += weights((rollingHash31(t) % buckets).toInt)
      i += 1
    }
    score
  }
}

/** Native distinct word-n-gram shingles — byte-compatible with the
  * expression chain `array_distinct(shingles(tokens(text), n))`
  * (TextOps): trim spaces, lowercase, Java-regex `\s+` split, space-joined
  * n-grams, first-occurrence-ordered distinct. One pass, no per-shingle
  * array slices.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n >= 1")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.wordShingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextHashKernels.wordShingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native `TextOps.rollingHashExpr`: portable 31-bit rolling hash. */
case class RollingHash31(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash31"
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.rollingHash31(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextHashKernels.rollingHash31($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native SimHash over an `array<string>` shingle column. */
case class SimHash31(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash31"
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.simHash31(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextHashKernels.simHash31($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Non-distinct shingle extraction (multiplicity preserved, in order) —
  * the n-gram-counting twin of `WordShingles`.
  */
case class WordShinglesAll(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n >= 1")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles_all"
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.wordShinglesAll(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextHashKernels.wordShinglesAll($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native X15 repetition metrics over an `array<string>` TOKEN column:
  * struct(dup_frac, top_bigram_frac) in one compiled O(n) pass (token
  * hash-set + bigram hash-map). Replaces two interpreted higher-order
  * folds that measured ~0.8 ms PER ROW on ~50-token docs (4.6 s for the
  * 5000-doc sf0.1 bench corpus); same int/int-derived double ratios, so
  * the DuckDB oracle is unchanged.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("dup_frac", DoubleType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = false)))
  override def prettyName: String = "graft_repetition_stats"
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.repetitionStats(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextHashKernels.repetitionStats($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native hashed-linear-classifier score over an `array<string>` token
  * column — one compiled O(tokens) pass (hash → bucket → integer weight →
  * sum), rides the scan inside whole-stage codegen. The interpreted
  * equivalent is a `transform`+`aggregate` HOF chain (the same shape X15
  * replaced at 8× cost).
  */
case class HashedBagScore(child: Expression, buckets: Int) extends UnaryExpression {
  require(buckets >= 2 && buckets <= 65536, "buckets in [2, 65536]")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hashed_bag_score"
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.hashedBagScore(input.asInstanceOf[ArrayData], buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextHashKernels.hashedBagScore($c, $buckets)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass segment strip against a BOUNDED hot set riding the plan as a
  * codegen reference object (a `java.util.HashSet[UTF8String]`): per
  * segment one hash lookup, versus the declarative broadcast form's
  * linear `array_contains` scan. The set is bounded by the caller
  * (`TextOps.stripBoilerplate` maxHotSet) — the same bound the broadcast
  * row form carries, materialized once driver-side instead of per task.
  * Output: struct(n_seg BIGINT, n_kept BIGINT, text_kept STRING).
  */
case class StripSegments(child: Expression,
                         hotSet: java.util.HashSet[UTF8String])
  extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_seg", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("text_kept", StringType, nullable = false)))
  override def prettyName: String = "graft_strip_segments"
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.stripSegments(input.asInstanceOf[ArrayData], hotSet)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("hotSet", hotSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextHashKernels.stripSegments($c, $setRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `HashedBagScore` with a LEARNED weight table (see
  * `TextHashKernels.hashedBagScoreWeighted`): the serving path of the
  * trained hashed-logit classifier. The weight array rides the plan as a
  * codegen reference object — swapping in refreshed weights is a new
  * literal, not a new operator — and the loop stays inside whole-stage
  * codegen like its fixed-weight sibling.
  */
case class HashedBagWeightedScore(child: Expression, weights: Array[Long],
                                  biasCnt: Long) extends UnaryExpression {
  require(weights.length >= 3 && weights.length <= 65537,
    "weights = buckets + 1 bias slot, buckets in [2, 65536]")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hashed_bag_weighted_score"
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.hashedBagScoreWeighted(input.asInstanceOf[ArrayData],
      weights, biasCnt)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", weights, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextHashKernels.hashedBagScoreWeighted($c, $wRef, ${biasCnt}L)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native fused MinHash-LSH band keys over an `array<string>` shingle
  * column (band = array position in the output).
  */
case class MinHashBandKeys(child: Expression, numHashes: Int, bands: Int,
                           rowsPerBand: Int) extends UnaryExpression {
  require(bands * rowsPerBand <= numHashes, "bands*rowsPerBand must fit signature")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_band_keys"
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.minHashBandKeys(input.asInstanceOf[ArrayData],
      numHashes, bands, rowsPerBand)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextHashKernels.minHashBandKeys($c, $numHashes, $bands, $rowsPerBand)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
