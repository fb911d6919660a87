package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document deduplication family.
  *
  * Exact dedup is a single hash aggregation on the content digest.
  * Near-dup detection never materializes the O(n²) pair space: MinHash
  * signatures are banded (LSH) so candidate pairs only arise from shared
  * buckets — O(n·bands + candidates) at any scale — and the exact
  * Jaccard check runs on candidates only. SimHash gives a 64-bit
  * fingerprint whose 16-bit chunks are the pigeonhole buckets for
  * hamming-distance ≤ 3 search.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per distinct content digest. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val digest = md5(col(textCol))
    df.withColumn("content_hash", digest)
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /** MinHash signature: numPerm independent minima over the shingle-hash
    * set. Uses xxhash64(permIndex, shingle) as the permutation family —
    * multiply-free, so it is safe under ANSI overflow semantics.
    */
  def withMinhashSignature(df: DataFrame, textCol: String, shingleN: Int, numPerm: Int): DataFrame = {
    val sh = TextFunctions.shingleSet(col(textCol), shingleN)
    df.withColumn("__shingles", sh)
      .withColumn(
        "minhash_sig",
        transform(
          sequence(lit(0), lit(numPerm - 1)),
          i => array_min(transform(col("__shingles"), s => xxhash64(i, s)))
        )
      )
  }

  /** LSH banding: one row per (doc, band) with the band's hash; docs
    * sharing any (band_id, band_hash) bucket become candidate pairs.
    */
  def lshCandidatePairs(signed: DataFrame, idCol: String, bands: Int, rowsPerBand: Int): DataFrame = {
    val banded = signed.select(
      col(idCol).as("__id"),
      posexplode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, concat_ws(",", slice(col("minhash_sig"), b * rowsPerBand + 1, lit(rowsPerBand))))
        )
      ).as(Seq("band_id", "band_hash"))
    )
    banded.as("a")
      .join(banded.as("b"), col("a.band_id") === col("b.band_id") &&
        col("a.band_hash") === col("b.band_hash") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
  }

  /** Exact word-shingle Jaccard for given pairs (candidates only). */
  def jaccardForPairs(pairs: DataFrame, docs: DataFrame, idCol: String, textCol: String, shingleN: Int): DataFrame = {
    val sh = docs.select(col(idCol).as("__id"), TextFunctions.shingleSet(col(textCol), shingleN).as("__sh"))
    pairs
      .join(sh.withColumnRenamed("__sh", "__sh_a"), pairs("id_a") === sh("__id")).drop("__id")
      .join(sh.withColumnRenamed("__sh", "__sh_b"), pairs("id_b") === sh("__id")).drop("__id")
      .withColumn("jaccard",
        size(array_intersect(col("__sh_a"), col("__sh_b"))) /
          size(array_distinct(concat(col("__sh_a"), col("__sh_b")))))
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash+LSH near-dup pipeline: candidates from banding, verified
    * with exact Jaccard ≥ threshold.
    */
  def minhashNearDups(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numPerm: Int = 64, bands: Int = 16, threshold: Double = 0.5
  ): DataFrame = {
    val rowsPerBand = numPerm / bands
    val signed      = withMinhashSignature(docs, textCol, shingleN, numPerm)
    val candidates  = lshCandidatePairs(signed, idCol, bands, rowsPerBand)
    jaccardForPairs(candidates, docs, idCol, textCol, shingleN)
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over token hashes: bit j of the fingerprint is the
    * sign of the vote sum over tokens of (bit j set ? +1 : -1).
    * Bit arithmetic via SQL expressions (shift amounts are columns).
    */
  def withSimhash(df: DataFrame, textCol: String): DataFrame = {
    df.withColumn("__th", transform(TextFunctions.tokens(col(textCol)), t => xxhash64(t)))
      .withColumn(
        "simhash",
        expr(
          """aggregate(
            |  transform(sequence(0, 63), j ->
            |    CASE WHEN aggregate(__th, 0, (acc, h) ->
            |      acc + CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) > 0
            |    THEN shiftleft(1L, j) ELSE 0L END),
            |  0L, (acc, b) -> acc | b)""".stripMargin
        )
      )
      .drop("__th")
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming (≤ 3):
    * pigeonhole on the four 16-bit chunks — any pair within distance 3
    * agrees on at least one chunk, so candidates come from chunk-bucket
    * joins, never a cross join.
    */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val hashed = withSimhash(docs, textCol).select(col(idCol).as("__id"), col("simhash"))
    val chunked = hashed.select(
      col("__id"), col("simhash"),
      posexplode(expr("transform(sequence(0, 3), c -> (simhash >> (c * 16)) & 65535)"))
        .as(Seq("chunk_id", "chunk_val"))
    )
    chunked.as("a")
      .join(chunked.as("b"), col("a.chunk_id") === col("b.chunk_id") &&
        col("a.chunk_val") === col("b.chunk_val") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
