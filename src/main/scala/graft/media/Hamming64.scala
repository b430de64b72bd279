package graft.media

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The 64-bit Hamming-band LSH join shared by the media near-dup
  * families ([[ImageDedup]] dHash, [[AudioDedup]] energy-envelope hash):
  * band-bucket candidates, then exact verification — never all-pairs.
  *
  *   - BUCKET: split each 64-bit hash into 8 bands × 8 bits; rows sharing
  *     ANY band bucket become candidate pairs (an equi-join on the band
  *     key — the `TextOps.nearDupPairs` LSH discipline). A hot-bucket cap
  *     bounds degenerate content (flat color, silence), which would
  *     otherwise go quadratic in one bucket.
  *   - VERIFY: exact Hamming distance over the full 64 bits ≤ maxDist.
  *     With 8-bit bands every pair within Hamming 7 is GUARANTEED a
  *     shared band (pigeonhole), so recall at maxDist ≤ 7 is exact.
  *
  * At 100 TB the only exchange is the band-key equi-join over
  * 8 × |rows| key rows; verification touches candidate pairs only.
  */
object Hamming64 {

  /** (id: long, h: long) → near-dup pairs (a, b, dist), a < b. */
  def nearDupPairs(hashed: DataFrame, maxDist: Int,
                   maxBucketSize: Int): DataFrame = {
    require(maxDist <= 7,
      "8-bit bands guarantee recall only to Hamming distance 7")
    // 8 bands of 8 bits: band key = (band index, band bits)
    val banded = hashed.select(col("id"), col("h"),
      explode(expr(
        "transform(sequence(0, 7), b -> named_struct(" +
          "'band', b, 'bits', (h >> (b * 8)) & 255))")).as("bk"))
    // hot-bucket cap: degenerate buckets truncate deterministically by id
    // (logged nowhere to drop silently — the cap is part of the contract).
    // Callers default the cap to 1000 = Spark's WindowGroupLimit
    // threshold, so the rank filter prunes map-side BEFORE the band
    // exchange — past it, every hot bucket's full membership shuffles.
    val capped = banded
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("bk")).orderBy(col("id"))))
      .where(col("rn") <= maxBucketSize)
      .drop("rn")
    val a = capped.select(col("bk"), col("id").as("a"), col("h").as("ha"))
    val b = capped.select(col("bk"), col("id").as("b"), col("h").as("hb"))
    a.join(b, Seq("bk"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"), col("ha"), col("hb"))
      .distinct()
      .withColumn("dist", expr("bit_count(ha ^ hb)"))
      .where(col("dist") <= maxDist)
      .select(col("a"), col("b"), col("dist").cast("int").as("dist"))
  }
}
