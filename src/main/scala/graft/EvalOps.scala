package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-evaluation and robust-statistics operators for the
  * training-data pipeline: quality-classifier calibration (grouped
  * ROC-AUC), annotation aggregation (majority vote), and outlier
  * handling (winsorization, median/MAD) — the measurement side of the
  * curation stack (selection/budget live in Curation.scala).
  *
  * All four follow the engine's exact-math gate discipline: integer /
  * fixed-point arithmetic end-to-end with at most ONE floating
  * division at the final projection, so results hash-match DuckDB
  * bit-for-bit. Everything is a grouped aggregation or a window over
  * group partitions — one shuffle each, no driver-side state, scales
  * with #groups, not #rows.
  */
object EvalOps {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "classifier_eval",
      (spark, dir) => {
        // grouped ROC-AUC via the Mann-Whitney rank statistic with
        // average-rank tie handling, computed on DISTINCT-score
        // aggregates: AUC = (2*Rpos - npos*(npos+1)) / (2*npos*nneg)
        // where 2*Rpos = sum over score groups of pos*(2*below+cnt+1).
        // Integer until the single final division.
        val docs = Tables(spark, dir).documents.selectExpr(
          "source",
          "CAST(n_chars % 997 AS BIGINT) AS score", // deterministic score proxy
          "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos")
        val byScore = docs.groupBy("source", "score")
          .agg(count(lit(1)).as("cnt"), sum("pos").as("pos"))
        val w = Window.partitionBy("source").orderBy("score")
          .rowsBetween(Window.unboundedPreceding, -1)
        byScore
          .withColumn("below", coalesce(sum("cnt").over(w), lit(0L)))
          .groupBy("source")
          .agg(
            sum(col("pos") * (col("below") * 2 + col("cnt") + 1)).as("r2"),
            sum("pos").as("npos"),
            sum(col("cnt") - col("pos")).as("nneg"))
          .selectExpr(
            "source", "CAST(npos AS BIGINT) AS npos", "CAST(nneg AS BIGINT) AS nneg",
            """CASE WHEN npos > 0 AND nneg > 0
               THEN CAST(r2 - npos * (npos + 1) AS DOUBLE) / CAST(2 * npos * nneg AS DOUBLE)
               END AS auc""")
          .orderBy("source")
      },
      Some("""
        WITH scored AS (
          SELECT source, CAST(n_chars % 997 AS BIGINT) AS score,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
          FROM documents),
        by_score AS (
          SELECT source, score, count(*) AS cnt, sum(pos) AS pos
          FROM scored GROUP BY source, score),
        ranked AS (
          SELECT source, score, cnt, pos,
                 coalesce(sum(cnt) OVER (PARTITION BY source ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
          FROM by_score)
        SELECT source,
               CAST(sum(pos) AS BIGINT) AS npos,
               CAST(sum(cnt - pos) AS BIGINT) AS nneg,
               CASE WHEN sum(pos) > 0 AND sum(cnt - pos) > 0
                 THEN CAST(sum(pos * (below * 2 + cnt + 1)) - sum(pos) * (sum(pos) + 1) AS DOUBLE)
                      / CAST(2 * sum(pos) * sum(cnt - pos) AS DOUBLE)
               END AS auc
        FROM ranked GROUP BY source ORDER BY source
      """.trim),
      bench = true
    ),
    QueryDef(
      "eval_retrieval_labels",
      // retrieval-quality measurement against the embeddings' label
      // column: precision@5 numerator and reciprocal rank of the first
      // same-label neighbor, per probe — integer counts and a fixed-point
      // 1000000 div rank, so the metric hash-matches. MRR/precision are
      // THE feedback loop for picking ANN operating points (the
      // recall-vs-depth curves in SimilaritySpec measure the index; this
      // measures end labels).
      (spark, dir) => {
        val e = Tables(spark, dir).embeddings
        val probes = e.filter(col("vec_id") < 10)
        val cands  = e.filter(col("vec_id") >= 10)
        val topk = graft.operators.Similarity.bruteForceTopK(
          probes, cands, "vec_id", "embedding", k = 5)
        val pl = probes.select(col("vec_id").as("probe_id"), col("label").as("__plabel"))
        val cl = cands.select(col("vec_id").as("neighbor_id"), col("label").as("__clabel"))
        topk.join(broadcast(pl), "probe_id").join(broadcast(cl), "neighbor_id")
          .groupBy("probe_id")
          .agg(
            sum(when(col("__clabel") === col("__plabel"), 1L).otherwise(0L)).as("n_relevant_at_5"),
            min(when(col("__clabel") === col("__plabel"), col("rank"))).as("__fr"))
          .select(col("probe_id"), col("n_relevant_at_5"),
            coalesce((lit(1000000L) / col("__fr")).cast("long"), lit(0L)).as("rr_fp"))
          .orderBy("probe_id")
      },
      Some("""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
             p AS (SELECT * FROM e WHERE vec_id < 10),
             c AS (SELECT * FROM e WHERE vec_id >= 10),
             topk AS (
               SELECT p.vec_id AS probe_id, p.label AS plabel,
                      c.vec_id AS neighbor_id, c.label AS clabel,
                      row_number() OVER (PARTITION BY p.vec_id
                        ORDER BY list_cosine_similarity(p.v, c.v) DESC, c.vec_id) AS rank
               FROM p, c QUALIFY rank <= 5)
        SELECT probe_id,
               CAST(sum(CASE WHEN clabel = plabel THEN 1 ELSE 0 END) AS BIGINT) AS n_relevant_at_5,
               CAST(COALESCE(1000000 // min(CASE WHEN clabel = plabel THEN rank END), 0) AS BIGINT) AS rr_fp
        FROM topk GROUP BY probe_id ORDER BY probe_id
      """.trim),
      bench = true
    ),
    QueryDef(
      "winsorize",
      (spark, dir) => {
        // per-group clamp at the exact p05/p95 order statistics
        // (ceil-rank definition, deterministic tiebreak) — outlier
        // taming before length-based selection. Bounds come from one
        // windowed pass; the clamp re-joins them broadcast.
        val docs = Tables(spark, dir).documents
        val n = Window.partitionBy("source")
        val rn = Window.partitionBy("source").orderBy("n_chars", "doc_id")
        val ranked = docs
          .withColumn("rn", row_number().over(rn))
          .withColumn("n", count(lit(1)).over(n))
        val bounds = ranked.groupBy("source").agg(
          max("n").as("n"),
          max(when(col("rn") === greatest(lit(1L), ceil(col("n") * 0.05).cast("long")), col("n_chars"))).as("lo"),
          max(when(col("rn") === greatest(lit(1L), ceil(col("n") * 0.95).cast("long")), col("n_chars"))).as("hi"))
        docs.join(broadcast(bounds), "source")
          .groupBy("source")
          .agg(
            max("n").cast("long").as("n"),
            max("lo").cast("long").as("lo"),
            max("hi").cast("long").as("hi"),
            sum(least(greatest(col("n_chars"), col("lo")), col("hi"))).cast("long").as("sum_clamped"))
          .orderBy("source")
      },
      Some("""
        WITH r AS (
          SELECT source, n_chars,
                 row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
                 count(*) OVER (PARTITION BY source) AS n
          FROM documents),
        b AS (
          SELECT source, max(n) AS n,
                 max(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.05 * n) AS BIGINT)) THEN n_chars END) AS lo,
                 max(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.95 * n) AS BIGINT)) THEN n_chars END) AS hi
          FROM r GROUP BY source)
        SELECT d.source,
               CAST(max(b.n) AS BIGINT) AS n,
               CAST(max(b.lo) AS BIGINT) AS lo,
               CAST(max(b.hi) AS BIGINT) AS hi,
               CAST(sum(LEAST(GREATEST(d.n_chars, b.lo), b.hi)) AS BIGINT) AS sum_clamped
        FROM documents d JOIN b ON d.source = b.source
        GROUP BY d.source ORDER BY d.source
      """.trim),
      bench = true
    ),
    QueryDef(
      "robust_stats",
      (spark, dir) => {
        // exact lower-median + MAD per group (order statistic at
        // floor((n+1)/2) with deterministic tiebreak) — robust center/
        // spread for documents, immune to the heavy length tail.
        val docs = Tables(spark, dir).documents
        def lowerMedian(df: org.apache.spark.sql.DataFrame, valueCol: String, out: String) = {
          val rn = Window.partitionBy("source").orderBy(valueCol, "doc_id")
          val n = Window.partitionBy("source")
          df.withColumn("rn", row_number().over(rn))
            .withColumn("n", count(lit(1)).over(n))
            .groupBy("source")
            .agg(
              max("n").as("n"),
              max(when(col("rn") === floor((col("n") + 1) / lit(2.0)).cast("long"), col(valueCol))).as(out))
        }
        val med = lowerMedian(docs, "n_chars", "median")
        val dev = docs.join(broadcast(med.select("source", "median")), "source")
          .withColumn("dev", abs(col("n_chars") - col("median")))
        lowerMedian(dev, "dev", "mad")
          .join(med.select("source", "median"), "source")
          .selectExpr("source", "CAST(n AS BIGINT) AS n",
            "CAST(median AS BIGINT) AS median", "CAST(mad AS BIGINT) AS mad")
          .orderBy("source")
      },
      Some("""
        WITH r AS (
          SELECT source, n_chars, doc_id,
                 row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
                 count(*) OVER (PARTITION BY source) AS n
          FROM documents),
        med AS (
          SELECT source, max(n) AS n,
                 max(CASE WHEN rn = CAST(FLOOR((n + 1) / 2.0) AS BIGINT) THEN n_chars END) AS median
          FROM r GROUP BY source),
        dev AS (
          SELECT d.source, ABS(d.n_chars - m.median) AS dev, d.doc_id
          FROM documents d JOIN med m ON d.source = m.source),
        r2 AS (
          SELECT source, dev,
                 row_number() OVER (PARTITION BY source ORDER BY dev, doc_id) AS rn,
                 count(*) OVER (PARTITION BY source) AS n
          FROM dev),
        mad AS (
          SELECT source, max(CASE WHEN rn = CAST(FLOOR((n + 1) / 2.0) AS BIGINT) THEN dev END) AS mad
          FROM r2 GROUP BY source)
        SELECT m.source, CAST(m.n AS BIGINT) AS n,
               CAST(m.median AS BIGINT) AS median, CAST(a.mad AS BIGINT) AS mad
        FROM med m JOIN mad a ON m.source = a.source
        ORDER BY m.source
      """.trim),
      bench = true
    ),
    QueryDef(
      "calibration_bins",
      (spark, dir) => {
        // classifier calibration curve: decile bins of the score vs the
        // observed positive rate per bin — integer counts, one division
        // at the projection. One groupBy shuffle, output = 10 rows/group.
        Tables(spark, dir).documents
          .selectExpr(
            "source",
            "CAST(FLOOR((n_chars % 997) * 10.0 / 997) AS BIGINT) AS bin",
            "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos")
          .groupBy("source", "bin")
          .agg(count(lit(1)).as("n"), sum("pos").as("pos"))
          .selectExpr("source", "bin", "CAST(n AS BIGINT) AS n", "CAST(pos AS BIGINT) AS pos",
            "CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS rate")
          .orderBy("source", "bin")
      },
      Some("""
        SELECT source, CAST(FLOOR((n_chars % 997) * 10.0 / 997) AS BIGINT) AS bin,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS rate
        FROM documents
        GROUP BY source, CAST(FLOOR((n_chars % 997) * 10.0 / 997) AS BIGINT)
        ORDER BY source, bin
      """.trim),
      bench = true
    ),
    QueryDef(
      "ks_statistic",
      (spark, dir) => {
        // exact Kolmogorov-Smirnov separation between the positive and
        // negative score distributions per group: running integer
        // cumulative counts over distinct scores, D = max |cumPos*nNeg -
        // cumNeg*nPos|, ONE division at the end — bit-exact vs DuckDB.
        val scored = Tables(spark, dir).documents.selectExpr(
          "source", "CAST(n_chars % 997 AS BIGINT) AS score",
          "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos")
        val by = scored.groupBy("source", "score")
          .agg(sum("pos").as("p"), sum(expr("1 - pos")).as("q"))
        val w = Window.partitionBy("source").orderBy("score")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val t = Window.partitionBy("source")
        by
          .withColumn("cp", sum("p").over(w))
          .withColumn("cq", sum("q").over(w))
          .withColumn("np", sum("p").over(t))
          .withColumn("nq", sum("q").over(t))
          .groupBy("source")
          .agg(
            max(abs(col("cp") * col("nq") - col("cq") * col("np"))).as("dnum"),
            max("np").as("npos"), max("nq").as("nneg"))
          .selectExpr("source", "CAST(npos AS BIGINT) AS npos", "CAST(nneg AS BIGINT) AS nneg",
            """CASE WHEN npos > 0 AND nneg > 0
               THEN CAST(dnum AS DOUBLE) / CAST(npos * nneg AS DOUBLE) END AS ks""")
          .orderBy("source")
      },
      Some("""
        WITH scored AS (
          SELECT source, CAST(n_chars % 997 AS BIGINT) AS score,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
          FROM documents),
        by_score AS (
          SELECT source, score, sum(pos) AS p, sum(1 - pos) AS q
          FROM scored GROUP BY source, score),
        cums AS (
          SELECT source,
                 sum(p) OVER (PARTITION BY source ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
                 sum(q) OVER (PARTITION BY source ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cq,
                 sum(p) OVER (PARTITION BY source) AS np,
                 sum(q) OVER (PARTITION BY source) AS nq
          FROM by_score)
        SELECT source, CAST(max(np) AS BIGINT) AS npos, CAST(max(nq) AS BIGINT) AS nneg,
               CASE WHEN max(np) > 0 AND max(nq) > 0
                 THEN CAST(max(ABS(cp * nq - cq * np)) AS DOUBLE) / CAST(max(np) * max(nq) AS DOUBLE)
               END AS ks
        FROM cums GROUP BY source ORDER BY source
      """.trim),
      bench = true
    ),
    QueryDef(
      "label_vote",
      (spark, dir) => {
        // annotation aggregation: 5 synthetic annotators per item vote
        // with their embedding label; majority wins, ties break to the
        // smallest label (deterministic). One count shuffle + one
        // window over items.
        val votes = Tables(spark, dir).embeddings
          .selectExpr("CAST(FLOOR(vec_id / 5.0) AS BIGINT) AS item", "label")
        val c = votes.groupBy("item", "label").agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("item").orderBy(col("cnt").desc, col("label").asc)
        val t = Window.partitionBy("item")
        c.withColumn("rk", row_number().over(w))
          .withColumn("total", sum("cnt").over(t))
          .where(col("rk") === 1)
          .selectExpr("item", "CAST(label AS INT) AS winner",
            "CAST(cnt AS BIGINT) AS votes_won", "CAST(total AS BIGINT) AS votes_total")
          .orderBy("item")
      },
      Some("""
        WITH votes AS (
          SELECT CAST(FLOOR(vec_id / 5.0) AS BIGINT) AS item, label FROM embeddings),
        c AS (SELECT item, label, count(*) AS cnt FROM votes GROUP BY item, label),
        w AS (
          SELECT item, label, cnt,
                 row_number() OVER (PARTITION BY item ORDER BY cnt DESC, label ASC) AS rk,
                 sum(cnt) OVER (PARTITION BY item) AS total
          FROM c)
        SELECT item, CAST(label AS INT) AS winner,
               CAST(cnt AS BIGINT) AS votes_won, CAST(total AS BIGINT) AS votes_total
        FROM w WHERE rk = 1 ORDER BY item
      """.trim),
      bench = true
    ),
    QueryDef(
      "eval_average_precision",
      (spark, dir) => {
        // grouped average precision (AP = mean of precision@rank over
        // the positives), the PR-curve companion to classifier_eval's
        // ROC-AUC. Ties are handled by the deterministic PESSIMISTIC
        // rule — within a score group every negative ranks before
        // every positive — so the metric is a pure function of the
        // (score → cnt, pos) histogram in both engines. Each
        // precision@rank is one integer fixed-point division
        // ((bp+k)·10^9 div rank), the AP numerator is an exact BIGINT
        // sum (order-independent), and ONE double division lands the
        // final value — hash-exact vs DuckDB, no float accumulation.
        // Scale bound: (npos)·10^9 must fit a BIGINT → npos < 9.2e9
        // per source, far above any per-source corpus here.
        // Plan shape: one (source, score) aggregation shuffle (score
        // domain ≤ 997), per-source windows over ≤ 997 rows, explode
        // of one row per POSITIVE (linear), final per-source agg.
        val docs = Tables(spark, dir).documents.selectExpr(
          "source",
          "CAST(n_chars % 997 AS BIGINT) AS score",
          "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos")
        val byScore = docs.groupBy("source", "score")
          .agg(count(lit(1)).as("cnt"), sum("pos").as("p"))
        val w = Window.partitionBy("source").orderBy(col("score").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val terms = byScore
          .withColumn("bp", coalesce(sum("p").over(w), lit(0L)))
          .withColumn("bc", coalesce(sum("cnt").over(w), lit(0L)))
          .where(col("p") > 0)
          .withColumn("k", explode(expr("sequence(1L, p)")))
          .withColumn("term_fp",
            expr("((bp + k) * CAST(1000000000 AS BIGINT)) div (bc + (cnt - p) + k)"))
          .groupBy("source").agg(sum("term_fp").as("ap_fp"))
        docs.groupBy("source").agg(sum("pos").as("npos"))
          .join(terms, Seq("source"), "left")
          .selectExpr(
            "source", "CAST(npos AS BIGINT) AS npos",
            """CASE WHEN npos > 0
               THEN CAST(ap_fp AS DOUBLE) / CAST(npos * CAST(1000000000 AS BIGINT) AS DOUBLE)
               END AS avg_precision""")
          .orderBy("source")
      },
      Some("""
        WITH scored AS (
          SELECT source, CAST(n_chars % 997 AS BIGINT) AS score,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
          FROM documents),
        by_score AS (
          SELECT source, score, count(*) AS cnt, CAST(sum(pos) AS BIGINT) AS p
          FROM scored GROUP BY source, score),
        ranked AS (
          SELECT source, score, cnt, p,
                 coalesce(sum(p) OVER (PARTITION BY source ORDER BY score DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bp,
                 coalesce(sum(cnt) OVER (PARTITION BY source ORDER BY score DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bc
          FROM by_score
        ),
        pos_groups AS (SELECT * FROM ranked WHERE p > 0),
        terms AS (
          SELECT source,
                 ((bp + k) * CAST(1000000000 AS BIGINT)) // (bc + (cnt - p) + k) AS term_fp
          FROM pos_groups, UNNEST(generate_series(1, p)) AS t(k)),
        ap AS (SELECT source, CAST(sum(term_fp) AS BIGINT) AS ap_fp FROM terms GROUP BY source),
        tot AS (SELECT source, sum(pos) AS npos FROM scored GROUP BY source)
        SELECT tot.source AS source, CAST(tot.npos AS BIGINT) AS npos,
               CASE WHEN tot.npos > 0
                 THEN CAST(ap.ap_fp AS DOUBLE) / CAST(tot.npos * CAST(1000000000 AS BIGINT) AS DOUBLE)
               END AS avg_precision
        FROM tot LEFT JOIN ap ON tot.source = ap.source
        ORDER BY source
      """.trim),
      bench = true
    ),
    QueryDef(
      "eval_ndcg",
      (spark, dir) => {
        // grouped NDCG@10 — the graded-relevance ranking metric
        // completing the eval family (ROC-AUC: classifier_eval; AP:
        // eval_average_precision). The log2 discounts are the only
        // irrational inputs, and engines disagree on log2 in the last
        // ulp, so the 10 discount factors are EXACT DECIMAL(14,12)
        // literals shared verbatim with the oracle; every DCG term is
        // rel × discount in exact decimal, the per-source sums are
        // exact decimal aggregation, and ONE double division lands
        // NDCG — hash-exact by construction. Ranks are deterministic
        // (score DESC, doc_id ASC; ideal ranking rel DESC, doc_id
        // ASC). Plan shape: two per-source windows (row_number, then
        // rank<=10 filter — at 100 TB a group-local top-k; the window
        // parallelizes across sources), two small aggs, one join.
        val discounts = Seq(
          "1.000000000000", "0.630929753571", "0.500000000000",
          "0.430676558073", "0.386852807235", "0.356207187108",
          "0.333333333333", "0.315464876786", "0.301029995664",
          "0.289064826318")
        val discArr = discounts.map(d => s"CAST('$d' AS DECIMAL(14,12))")
          .mkString("array(", ", ", ")")
        val docs = Tables(spark, dir).documents.selectExpr(
          "source", "doc_id",
          "CAST(n_chars % 997 AS BIGINT) AS score",
          "CAST(doc_id % 4 AS BIGINT) AS rel")
        val wScore = Window.partitionBy("source").orderBy(col("score").desc, col("doc_id").asc)
        val wRel   = Window.partitionBy("source").orderBy(col("rel").desc, col("doc_id").asc)
        def gain(ranked: org.apache.spark.sql.DataFrame, out: String) = ranked
          .where(col("rk") <= 10)
          .withColumn("term", expr(s"CAST(rel * element_at($discArr, CAST(rk AS INT)) AS DECIMAL(26,12))"))
          .groupBy("source").agg(sum("term").as(out))
        val dcg  = gain(docs.withColumn("rk", row_number().over(wScore)), "dcg_d")
        val idcg = gain(docs.withColumn("rk", row_number().over(wRel)), "idcg_d")
        dcg.join(idcg, Seq("source"))
          .selectExpr(
            "source",
            "CAST(dcg_d AS DOUBLE) AS dcg",
            "CAST(idcg_d AS DOUBLE) AS idcg",
            """CASE WHEN idcg_d > 0
               THEN CAST(dcg_d AS DOUBLE) / CAST(idcg_d AS DOUBLE) END AS ndcg10""")
          .orderBy("source")
      },
      Some("""
        WITH docs AS (
          SELECT source, doc_id, CAST(n_chars % 997 AS BIGINT) AS score,
                 CAST(doc_id % 4 AS BIGINT) AS rel
          FROM documents),
        d(rk, disc) AS (VALUES
          (1, CAST('1.000000000000' AS DECIMAL(14,12))),
          (2, CAST('0.630929753571' AS DECIMAL(14,12))),
          (3, CAST('0.500000000000' AS DECIMAL(14,12))),
          (4, CAST('0.430676558073' AS DECIMAL(14,12))),
          (5, CAST('0.386852807235' AS DECIMAL(14,12))),
          (6, CAST('0.356207187108' AS DECIMAL(14,12))),
          (7, CAST('0.333333333333' AS DECIMAL(14,12))),
          (8, CAST('0.315464876786' AS DECIMAL(14,12))),
          (9, CAST('0.301029995664' AS DECIMAL(14,12))),
          (10, CAST('0.289064826318' AS DECIMAL(14,12)))),
        ranked AS (
          SELECT source, rel,
                 row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id ASC) AS rk
          FROM docs),
        dcg AS (
          SELECT source, sum(CAST(rel * disc AS DECIMAL(26,12))) AS dcg_d
          FROM ranked JOIN d USING (rk) WHERE rk <= 10 GROUP BY source),
        ideal AS (
          SELECT source, rel,
                 row_number() OVER (PARTITION BY source ORDER BY rel DESC, doc_id ASC) AS rk
          FROM docs),
        idcg AS (
          SELECT source, sum(CAST(rel * disc AS DECIMAL(26,12))) AS idcg_d
          FROM ideal JOIN d USING (rk) WHERE rk <= 10 GROUP BY source)
        SELECT dcg.source AS source,
               CAST(dcg_d AS DOUBLE) AS dcg,
               CAST(idcg_d AS DOUBLE) AS idcg,
               CASE WHEN idcg_d > 0
                 THEN CAST(dcg_d AS DOUBLE) / CAST(idcg_d AS DOUBLE) END AS ndcg10
        FROM dcg JOIN idcg ON dcg.source = idcg.source
        ORDER BY source
      """.trim),
      bench = true
    ),
    QueryDef(
      "eval_mrr",
      (spark, dir) => {
        // reciprocal rank of the first relevant document per group —
        // the third standard retrieval metric beside AP and NDCG.
        // rank is an exact integer (deterministic tiebreak), so
        // 1.0/rank is the same double in both engines; one window,
        // one filter, one per-group min — no float accumulation.
        val docs = Tables(spark, dir).documents.selectExpr(
          "source", "doc_id",
          "CAST(n_chars % 997 AS BIGINT) AS score",
          "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS rel")
        val w = Window.partitionBy("source").orderBy(col("score").desc, col("doc_id").asc)
        val firstRel = docs.withColumn("rk", row_number().over(w))
          .where(col("rel") === 1)
          .groupBy("source").agg(min("rk").as("first_rel_rank"))
        docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
          .join(firstRel, Seq("source"), "left")
          .selectExpr("source", "CAST(n_docs AS BIGINT) AS n_docs",
            "CAST(first_rel_rank AS BIGINT) AS first_rel_rank",
            "CAST(1.0 AS DOUBLE) / first_rel_rank AS rr")
          .orderBy("source")
      },
      Some("""
        WITH docs AS (
          SELECT source, doc_id, CAST(n_chars % 997 AS BIGINT) AS score,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS rel
          FROM documents),
        ranked AS (
          SELECT source, rel,
                 row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id ASC) AS rk
          FROM docs),
        first_rel AS (
          SELECT source, CAST(min(rk) AS BIGINT) AS first_rel_rank
          FROM ranked WHERE rel = 1 GROUP BY source),
        totals AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM docs GROUP BY source)
        SELECT totals.source AS source, n_docs, first_rel_rank,
               CAST(1.0 AS DOUBLE) / first_rel_rank AS rr
        FROM totals LEFT JOIN first_rel ON totals.source = first_rel.source
        ORDER BY source
      """.trim),
      bench = true
    ),
    QueryDef(
      "eval_kappa",
      (spark, dir) => {
        // Cohen's kappa — inter-annotator agreement corrected for
        // chance, the standard label-quality gate before training on
        // human annotations. Two synthetic annotators per item (labels
        // of vec 2i and 2i+1), grouped into 4 annotation batches.
        // Exact form: kappa = (agree·n − Σ_k a_k·b_k) /
        // (n² − Σ_k a_k·b_k) — both sides exact BIGINTs, ONE double
        // division at the end (the engine's exact-math gate
        // discipline). Plan: one per-item aggregation, two per-(batch,
        // label) marginal aggregations joined on the tiny label
        // domain, one final per-batch aggregation — three shuffles,
        // all on bounded keys.
        val pairs = Tables(spark, dir).embeddings
          .selectExpr("CAST(FLOOR(vec_id / 2.0) AS BIGINT) AS item",
            "CAST(vec_id % 2 AS INT) AS slot", "label")
          .groupBy("item")
          .agg(
            max(when(col("slot") === 0, col("label"))).as("a"),
            max(when(col("slot") === 1, col("label"))).as("b"))
          .where(col("a").isNotNull && col("b").isNotNull)
          .withColumn("g", pmod(col("item"), lit(4L)).cast("int"))
        val base = pairs.groupBy("g").agg(
          count(lit(1)).as("n"),
          sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("agree"))
        val aCnt = pairs.groupBy("g", "a").agg(count(lit(1)).as("ca"))
          .withColumnRenamed("a", "lbl")
        val bCnt = pairs.groupBy("g", "b").agg(count(lit(1)).as("cb"))
          .withColumnRenamed("b", "lbl")
        val chance = aCnt.join(bCnt, Seq("g", "lbl"))
          .groupBy("g").agg(sum(col("ca") * col("cb")).as("pe_num"))
        base.join(chance, Seq("g"))
          .selectExpr("g", "CAST(n AS BIGINT) AS n", "CAST(agree AS BIGINT) AS agree",
            """CASE WHEN n * n <> pe_num
               THEN CAST(agree * n - pe_num AS DOUBLE) / CAST(n * n - pe_num AS DOUBLE)
               END AS kappa""")
          .orderBy("g")
      },
      Some("""
        WITH pairs AS (
          SELECT CAST(FLOOR(vec_id / 2.0) AS BIGINT) AS item,
                 max(CASE WHEN vec_id % 2 = 0 THEN label END) AS a,
                 max(CASE WHEN vec_id % 2 = 1 THEN label END) AS b
          FROM embeddings GROUP BY 1),
        g AS (
          SELECT item % 4 AS g, a, b FROM pairs
          WHERE a IS NOT NULL AND b IS NOT NULL),
        base AS (
          SELECT g, count(*) AS n,
                 sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS agree
          FROM g GROUP BY g),
        ac AS (SELECT g, a AS lbl, count(*) AS ca FROM g GROUP BY g, a),
        bc AS (SELECT g, b AS lbl, count(*) AS cb FROM g GROUP BY g, b),
        chance AS (
          SELECT ac.g AS g, sum(ca * cb) AS pe_num
          FROM ac JOIN bc ON ac.g = bc.g AND ac.lbl = bc.lbl GROUP BY ac.g)
        SELECT CAST(base.g AS INT) AS g, CAST(n AS BIGINT) AS n,
               CAST(agree AS BIGINT) AS agree,
               CASE WHEN n * n <> pe_num
                 THEN CAST(agree * n - pe_num AS DOUBLE) / CAST(n * n - pe_num AS DOUBLE)
               END AS kappa
        FROM base JOIN chance ON base.g = chance.g
        ORDER BY g
      """.trim),
      bench = true
    ),
    QueryDef(
      "eval_confusion",
      (spark, dir) => {
        // per-class confusion summary (precision / recall / F1) for a
        // deterministic synthetic classifier (every 7th prediction
        // shifted one class up) — the standard per-class quality report
        // for a filtering classifier. Exact integers throughout;
        // precision, recall, and F1 are each ONE double division
        // (F1 = 2tp/(predTotal+trueTotal) — never composed from the
        // other two floats). Plan: one (pred, true) pair-count shuffle
        // on a ≤ |classes|² domain, then tiny per-class aggregations.
        val scored = Tables(spark, dir).embeddings.selectExpr(
          "label AS truth",
          "CAST(label + CASE WHEN vec_id % 7 = 0 THEN 1 ELSE 0 END AS INT) AS pred")
        val pairCnt = scored.groupBy("pred", "truth").agg(count(lit(1)).as("cnt"))
        val predTot = pairCnt.groupBy("pred").agg(sum("cnt").as("pred_total"))
          .withColumnRenamed("pred", "cls")
        val trueTot = pairCnt.groupBy("truth").agg(sum("cnt").as("true_total"))
          .withColumnRenamed("truth", "cls")
        val tp = pairCnt.where(col("pred") === col("truth"))
          .select(col("pred").as("cls"), col("cnt").as("tp"))
        predTot.join(trueTot, Seq("cls"), "full_outer")
          .join(tp, Seq("cls"), "left")
          .selectExpr(
            "CAST(cls AS INT) AS cls",
            "CAST(coalesce(tp, 0) AS BIGINT) AS tp",
            "CAST(coalesce(pred_total, 0) AS BIGINT) AS pred_total",
            "CAST(coalesce(true_total, 0) AS BIGINT) AS true_total",
            """CASE WHEN coalesce(pred_total, 0) > 0
               THEN CAST(coalesce(tp, 0) AS DOUBLE) / pred_total END AS precision""",
            """CASE WHEN coalesce(true_total, 0) > 0
               THEN CAST(coalesce(tp, 0) AS DOUBLE) / true_total END AS recall""",
            """CASE WHEN coalesce(pred_total, 0) + coalesce(true_total, 0) > 0
               THEN CAST(2 * coalesce(tp, 0) AS DOUBLE)
                    / (coalesce(pred_total, 0) + coalesce(true_total, 0)) END AS f1""")
          .orderBy("cls")
      },
      Some("""
        WITH scored AS (
          SELECT label AS truth,
                 CAST(label + CASE WHEN vec_id % 7 = 0 THEN 1 ELSE 0 END AS INT) AS pred
          FROM embeddings),
        pair_cnt AS (SELECT pred, truth, count(*) AS cnt FROM scored GROUP BY pred, truth),
        pred_tot AS (SELECT pred AS cls, sum(cnt) AS pred_total FROM pair_cnt GROUP BY pred),
        true_tot AS (SELECT truth AS cls, sum(cnt) AS true_total FROM pair_cnt GROUP BY truth),
        tp AS (SELECT pred AS cls, cnt AS tp FROM pair_cnt WHERE pred = truth)
        SELECT CAST(cls AS INT) AS cls,
               CAST(coalesce(tp, 0) AS BIGINT) AS tp,
               CAST(coalesce(pred_total, 0) AS BIGINT) AS pred_total,
               CAST(coalesce(true_total, 0) AS BIGINT) AS true_total,
               CASE WHEN coalesce(pred_total, 0) > 0
                 THEN CAST(coalesce(tp, 0) AS DOUBLE) / pred_total END AS precision,
               CASE WHEN coalesce(true_total, 0) > 0
                 THEN CAST(coalesce(tp, 0) AS DOUBLE) / true_total END AS recall,
               CASE WHEN coalesce(pred_total, 0) + coalesce(true_total, 0) > 0
                 THEN CAST(2 * coalesce(tp, 0) AS DOUBLE)
                      / (coalesce(pred_total, 0) + coalesce(true_total, 0)) END AS f1
        FROM pred_tot
        FULL JOIN true_tot USING (cls)
        LEFT JOIN tp USING (cls)
        ORDER BY cls
      """.trim),
      bench = true
    )
  )
}
