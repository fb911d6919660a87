package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composition every training-data
  * pipeline runs, declared as one config and planned as ONE Spark job
  * chain (each stage is a narrow filter or the documented scale-shaped
  * operator — nothing materializes between stages unless a stage is
  * inherently blocking).
  *
  * Stage order follows practice (cheap row-local filters first, joins
  * and aggregations last, over the already-shrunk corpus):
  *
  *  1. quality floor       — row-local (TextProfile kernel)
  *  2. language allowlist  — row-local (kernel langid)
  *  3. repetition cut      — row-local (NGramProfile kernel)
  *  4. near-dup removal    — exact hash / MinHash-LSH + components
  *  5. decontamination     — Bloom sketch (no join) or exact semi join
  *  6. sequence packing    — optional, two-phase numbering
  *
  * Every stage is individually oracle- or spec-verified; this operator
  * is about the COMPOSITION: filters stay pushed at the scan, the
  * expensive pair work only ever sees survivors of the cheap stages.
  */
object CurationPipeline {

  sealed trait DedupMode
  case object NoDedup extends DedupMode
  case object ExactDedup extends DedupMode
  /** MinHash-LSH candidates → connected components → one survivor. */
  case object NearDedup extends DedupMode

  final case class Config(
      minQuality: Double = 0.0,
      languages: Set[String] = Set.empty, // empty = keep all
      maxDup3GramFrac: Double = 1.0,      // 1.0 = no repetition cut
      /** deflate-ratio window: docs outside [lo, hi] are dropped
        * (boilerplate below, gibberish above); None = no cut.
        */
      compressRatioBounds: Option[(Double, Double)] = None,
      /** corpus-relative rare-token ceiling; 1.0 = no cut. */
      maxRareTokenFrac: Double = 1.0,
      dedup: DedupMode = ExactDedup,
      decontaminateAgainst: Option[DataFrame] = None,
      decontaminateShingleN: Int = 3,
      useBloomDecontamination: Boolean = true,
      tokenBudget: Option[Long] = None
  )

  /** Run the configured stages over `docs(idCol, textCol, ...)`.
    * Returns the curated corpus (packed into `seq_id` groups when
    * `tokenBudget` is set).
    */
  def run(docs: DataFrame, idCol: String, textCol: String, cfg: Config): DataFrame = {
    // 1-3: row-local filters — semi joins on precomputed row-local
    // features keyed by id (each feature frame is a projection of the
    // same scan; Catalyst collapses the chain into one pass per feature
    // family, and the joins are key-equal with tiny right sides after
    // aggressive filters)
    var kept = docs
    if (cfg.minQuality > 0.0) {
      val q = TextAnalysis.qualityScore(docs, idCol, textCol)
        .filter(col("quality_score") >= cfg.minQuality).select(col(idCol))
      kept = kept.join(q, Seq(idCol), "left_semi")
    }
    if (cfg.languages.nonEmpty) {
      val l = TextAnalysis.langId(docs, idCol, textCol)
        .filter(col("predicted_lang").isin(cfg.languages.toSeq: _*)).select(col(idCol))
      kept = kept.join(l, Seq(idCol), "left_semi")
    }
    if (cfg.maxDup3GramFrac < 1.0) {
      val r = TextAnalysis.repetitionProfile(docs, idCol, textCol)
        .filter(col("dup_3gram_frac") <= cfg.maxDup3GramFrac).select(col(idCol))
      kept = kept.join(r, Seq(idCol), "left_semi")
    }
    cfg.compressRatioBounds.foreach { case (lo, hi) =>
      val cr = graft.plans.TextVectorExpressions.deflateRatio(col(textCol))
      kept = kept.filter(cr.between(lo, hi))
    }
    if (cfg.maxRareTokenFrac < 1.0) {
      // corpus-relative: frequencies come from the PRE-filter corpus so
      // the signal is stable regardless of which cheap filters ran first
      val rare = TextAnalysis.rarityProfile(docs, idCol, textCol)
        .filter(col("rare_token_frac") <= cfg.maxRareTokenFrac).select(col(idCol))
      kept = kept.join(rare, Seq(idCol), "left_semi")
    }

    // 4: dedup over the filtered survivors only
    kept = cfg.dedup match {
      case NoDedup    => kept
      case ExactDedup =>
        val keep = Dedup.exact(kept, idCol, textCol).select(col("keep_id").as(idCol))
        kept.join(keep, Seq(idCol), "left_semi")
      case NearDedup  =>
        val pairs = Dedup.minhashNearDups(kept, idCol, textCol)
        Dedup.resolveSurvivors(kept, pairs, idCol)
    }

    // 5: decontamination (anti join against the flagged sliver)
    cfg.decontaminateAgainst.foreach { bench =>
      val flagged =
        if (cfg.useBloomDecontamination)
          Curation.contaminatedDocsBloom(kept, bench, idCol, textCol, cfg.decontaminateShingleN)
        else
          Curation.contaminatedDocs(kept, bench, idCol, textCol, cfg.decontaminateShingleN)
      kept = kept.join(flagged, Seq(idCol), "left_anti")
    }

    // 6: packing
    cfg.tokenBudget match {
      case Some(budget) =>
        val packed = Curation.packAssignments(kept.select(col(idCol), col(textCol)), idCol, textCol, budget)
        kept.join(packed.select(col(idCol), col("seq_id")), Seq(idCol))
      case None => kept
    }
  }
}
