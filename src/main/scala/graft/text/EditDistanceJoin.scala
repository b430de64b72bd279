package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance fuzzy join (record linkage, typo-tolerant entity
  * resolution): pair left strings with right strings at Levenshtein
  * distance ≤ d — without the |L|×|R| product, and WITHOUT recall loss.
  *
  * Blocking is the PassJoin pigeonhole scheme, which is COMPLETE (a
  * theorem, not a probability): split a left string of length ℓ into d+1
  * segments — any right string within edit distance d must contain at
  * least one segment as an EXACT substring, at a position shifted by at
  * most d from the segment's home position. So the left side emits its
  * d+1 segments keyed (ℓ, segment#, text); the right side emits, for
  * every plausible left length ℓ ∈ [len−d, len+d] and every shift ∈
  * [−d, d], the substring in that window — a bounded (2d+1)²·(d+1)-key
  * fan-out per row (18 keys at d=1). Candidates come from the exact-key
  * equi-join; every candidate is verified with the real `levenshtein`
  * (codegen'd), so the output is EXACTLY the brute-force result —
  * mathematically, not probabilistically (the x27 oracle recomputes the
  * full product and hash-matches).
  *
  * Scale shape: the blocking join shuffles fixed-width (length, seg#,
  * short-substring, id) rows; verification touches only surviving
  * candidate pairs with a length-difference pre-filter. Segment keys
  * inherit the corpus' content diversity — a degenerate corpus (all
  * strings share a constant region) concentrates buckets exactly like
  * LSH boilerplate; the same `maxBucketSize`-style guard applies if
  * needed (compose with `TextOps.lshBucketStats` thinking).
  */
object EditDistanceJoin {

  /** Join rows of `left` and `right` whose `strCol` values are within
    * Levenshtein distance `maxDist`. Output: (leftId, rightId, dist).
    */
  def join(left: DataFrame, right: DataFrame, maxDist: Int,
           leftId: String = "probe_id", rightId: String = "doc_id",
           strCol: String = "s"): DataFrame = {
    require(maxDist >= 1 && maxDist <= 3, "maxDist in [1,3]")
    val d = maxDist
    val k = d + 1

    // left: its own k segments, keyed by its true length
    val lKeys = left
      .select(col(leftId), col(strCol).as("__ls"), length(col(strCol)).as("__ll"))
      .select(col(leftId), col("__ls"), col("__ll").as("__l"),
        explode(sequence(lit(0), lit(k - 1))).as("__i"))
      .withColumn("__seg", expr(
        s"substring(__ls, ${segStartSql("__l", "__i", k)} + 1, ${segLenSql("__l", "__i", k)})"))
      .filter(length(col("__seg")) > 0)
      .select(col(leftId), col("__l"), col("__i"), col("__seg"))

    // right: for each plausible left length and shift, the window substring
    val rKeys = right
      .select(col(rightId), col(strCol).as("__rs"), length(col(strCol)).as("__rl"))
      .select(col(rightId), col("__rs"), col("__rl"),
        explode(sequence(col("__rl") - d, col("__rl") + d)).as("__l"))
      .filter(col("__l") >= k) // a k-segment split needs at least k chars
      .select(col(rightId), col("__rs"), col("__l"),
        explode(sequence(lit(0), lit(k - 1))).as("__i"))
      .select(col(rightId), col("__rs"), col("__l"), col("__i"),
        explode(sequence(lit(-d), lit(d))).as("__shift"))
      .withColumn("__pos", expr(segStartSql("__l", "__i", k)) + col("__shift"))
      .filter(col("__pos") >= 0)
      .withColumn("__seg", expr(
        s"substring(__rs, __pos + 1, ${segLenSql("__l", "__i", k)})"))
      .filter(length(col("__seg")) > 0)
      .select(col(rightId), col("__l"), col("__i"), col("__seg"))

    // Completeness edge: a left string SHORTER than k = d+1 chars cannot
    // contribute k non-empty segments, so the pigeonhole argument does
    // not apply to it. Such strings are at most d chars and can only
    // match rights of length <= 2d — pair the two tiny slices through a
    // target-length equi-join (left explodes its ±d length window), so
    // even this sliver stays a hash join, never a product.
    val shortCand = left
      .filter(length(col(strCol)) < k)
      .select(col(leftId),
        explode(sequence(length(col(strCol)) - d, length(col(strCol)) + d))
          .as("__lb"))
      .join(right.filter(length(col(strCol)) <= 2 * d)
        .select(col(rightId), length(col(strCol)).as("__lb")), "__lb")
      .select(col(leftId), col(rightId))

    val cand = lKeys.join(rKeys, Seq("__l", "__i", "__seg"))
      .select(col(leftId), col(rightId))
      .unionByName(shortCand)
      .dropDuplicates(leftId, rightId)

    // verify on the surviving pairs only (re-attach strings, length gate
    // first — it kills most false candidates before the DP runs)
    val ls = left.select(col(leftId), col(strCol).as("__a"))
    val rs = right.select(col(rightId), col(strCol).as("__b"))
    cand.join(ls, leftId).join(rs, rightId)
      .filter(abs(length(col("__a")) - length(col("__b"))) <= d)
      .select(col(leftId), col(rightId),
        levenshtein(col("__a"), col("__b")).cast("long").as("dist"))
      .filter(col("dist") <= d)
  }

  // SQL-text twins of segStart/segLen so substring() sees plain integer
  // arithmetic (computed start/len columns must be inlined into the
  // substring call's expression)
  private def segStartSql(l: String, i: String, k: Int): String =
    s"($i * CAST($l / $k AS INT) + GREATEST(0, $i - ($k - CAST($l % $k AS INT))))"
  private def segLenSql(l: String, i: String, k: Int): String =
    s"(CAST($l / $k AS INT) + (CASE WHEN $i >= $k - CAST($l % $k AS INT) THEN 1 ELSE 0 END))"
}
