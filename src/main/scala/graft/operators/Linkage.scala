package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage: the TWO-TABLE counterpart of
  * [[Dedup.editDistancePairs]] — all (left, right) pairs whose link
  * keys are within `maxDist` edits, without the |L|×|R| pair space.
  *
  * Same PassJoin-family pigeonhole (Li et al., ICDE'11 — public
  * algorithm): split each LEFT string into maxDist+1 contiguous
  * segments; any RIGHT string within distance maxDist contains at
  * least one of those segments exactly, shifted by at most maxDist
  * positions. LEFT emits maxDist+1 segment keys, RIGHT emits a
  * CONSTANT ≤ (2·maxDist+1)²·(maxDist+1) substring keys; candidates
  * come from the equi-join on (left-length, segment-ordinal, content)
  * — never a cross join — and the banded Levenshtein verify runs on
  * candidates only. Fanout per record is independent of either
  * table's size, so linking a 100 TB corpus against a reference
  * entity table keeps the shape of an ordinary equi-join.
  *
  * Output: (id_l, id_r, dist), dist ≤ maxDist, one row per linked
  * pair. Matching is directionless (levenshtein is symmetric); the
  * roles only decide which side is segment-indexed — index the side
  * with the SMALLER key fanout if they differ wildly in size.
  */
object Linkage {
  def editDistanceJoin(
      left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      maxDist: Int
  ): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    val p = maxDist + 1 // number of segments
    val l = left.select(col(leftId).as("id_l"), col(leftStr).as("__sl"),
      length(col(leftStr)).as("__ll"))
    val r = right.select(col(rightId).as("id_r"), col(rightStr).as("__sr"),
      length(col(rightStr)).as("__lr"))

    def segStart(i: Column, len: Column) = floor(i * len / p).cast("int")
    def boundedSeq(lo: Column, hi: Column) =
      when(hi >= lo, sequence(lo, hi)).otherwise(array().cast("array<int>"))

    // index role (left): the p segments, keyed by (own length, ordinal, content)
    val idx = l
      .select(col("id_l"), col("__ll").as("l"),
        explode(sequence(lit(0), lit(maxDist))).as("i"), col("__sl"))
      .select(col("id_l"), col("l"), col("i"),
        col("__sl").substr(segStart(col("i"), col("l")) + 1,
          segStart(col("i") + 1, col("l")) - segStart(col("i"), col("l"))).as("seg"))

    // probe role (right): substrings at each plausible indexed length
    // and ordinal, within a ±maxDist position window
    val probe = r
      .select(col("id_r"), col("__sr"), col("__lr"),
        explode(boundedSeq(greatest(col("__lr") - maxDist, lit(0)).cast("int"),
          (col("__lr") + maxDist).cast("int"))).as("l"))
      .select(col("id_r"), col("__sr"), col("__lr"), col("l"),
        explode(sequence(lit(0), lit(maxDist))).as("i"))
      .withColumn("segLen",
        segStart(col("i") + 1, col("l")) - segStart(col("i"), col("l")))
      .withColumn("pos", explode(boundedSeq(
        greatest(segStart(col("i"), col("l")) - maxDist, lit(0)),
        least(segStart(col("i"), col("l")) + maxDist, col("__lr") - col("segLen")).cast("int"))))
      .select(col("id_r"), col("l"), col("i"),
        col("__sr").substr(col("pos") + 1, col("segLen")).as("seg"))

    // candidate ids deduped BEFORE strings are fetched (16-byte rows
    // through the distinct), then banded verify on candidates only
    val candidates = idx.join(probe, Seq("l", "i", "seg"))
      .select(col("id_l"), col("id_r")).distinct()
    candidates
      .join(l.select(col("id_l"), col("__sl")), Seq("id_l"))
      .join(r.select(col("id_r"), col("__sr")), Seq("id_r"))
      .withColumn("dist", levenshtein(col("__sl"), col("__sr"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_l"), col("id_r"), col("dist"))
  }
}
