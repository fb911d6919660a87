package graft.operators

import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Driver-side evaluation of the EXACT engine expressions the bounded
  * serving paths otherwise run as one-tiny-row Spark jobs. At
  * interactive concurrency those jobs are the ceiling — clients
  * multiply executors, not driver job dispatch (BENCH_SF1 round-13
  * addendum 4 measured the interactive mix scaling 6× where the
  * 3-kind mix scaled 12×) — so probe tokenization and bucket routing
  * move onto the driver thread itself.
  *
  * Everything here calls the SAME engine entry points the build/serve
  * expressions compile to (UTF8String.trim's ASCII-space semantics,
  * XxHash64Function with Spark's seed 42) rather than re-implementing
  * them — a re-implemented hash or trim would be a silent-miss risk
  * against the persisted layout. DriverEvalSpec pins equality against
  * the engine expressions over a generated corpus (unicode,
  * empty/whitespace-only, control chars, long tokens).
  */
private[graft] object DriverEval {

  /** == `split(trim(text), "\\s+")` (the build tokenizer,
    * [[graft.functions.TextFunctions.tokens]]). Note: NOT
    * `String.trim` — Java trims all chars ≤ 0x20 while Spark's
    * StringTrim (via UTF8String.trim) strips ASCII space 0x20 only, so
    * a text with a leading tab keeps it (and splits into a leading
    * empty token) in BOTH engines.
    */
  def tokenize(text: String): Seq[String] =
    UTF8String.fromString(text).trim().toString.split("\\s+", -1).toSeq

  /** == `pmod(xxhash64(tok), buckets)` — the postings layout hash
    * ([[InvertedIndex]]'s bucketOf). Same XxHash64Function and default
    * seed (42) the Catalyst expression evaluates.
    */
  def bucketOf(tok: String, buckets: Int): Int =
    java.lang.Math.floorMod(
      org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        UTF8String.fromString(tok), StringType, 42L),
      buckets.toLong).toInt

  /** == `pmod(xxhash64(id), shards)` on a LONG id — the federation's
    * document route ([[ShardedIndex]]). The driver twin lets id-keyed
    * serves (highlighting a result page) touch ONLY the shards the
    * requested ids route to, without a Spark job to find out.
    */
  def shardOf(id: Long, shards: Int): Int =
    java.lang.Math.floorMod(
      org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        java.lang.Long.valueOf(id), org.apache.spark.sql.types.LongType, 42L),
      shards.toLong).toInt
}
