package graft

import graft.catalog.{ColStats, FileEntry, StatsPruner}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property gate on manifest-stats file skipping: for ANY file content
  * and ANY supported filter, a pruned file must contain no matching
  * row — pruning may only ever be a false KEEP, never a false SKIP.
  * The file's stats are derived from its rows exactly as the writer
  * derives them, then the pruner's verdict is checked against brute-
  * force row evaluation. Seeded sampling (no scalatestplus bridge in
  * this environment), 2000 deterministic cases.
  */
class StatsPrunerSpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] = {
    var seed = Seed(20260814L)
    (1 to n).flatMap { _ =>
      val a = gen.apply(Gen.Parameters.default.withSize(12), seed)
      seed = seed.next
      a
    }
  }

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("s", StringType)))

  private def entryFor(rows: Seq[(Option[Long], Option[String])]): FileEntry = {
    val ks = rows.flatMap(_._1); val ss = rows.flatMap(_._2)
    FileEntry("data/f.parquet", rows.size.toLong, 0L, Map(
      "k" -> ColStats(ks.minOption.map(_.toString), ks.maxOption.map(_.toString),
        rows.count(_._1.isEmpty).toLong),
      "s" -> ColStats(ss.minOption, ss.maxOption, rows.count(_._2.isEmpty).toLong)))
  }

  private def evalRow(f: Filter, k: Option[Long], s: Option[String]): Boolean = f match {
    case EqualTo("k", v: Long) => k.contains(v)
    case GreaterThan("k", v: Long) => k.exists(_ > v)
    case GreaterThanOrEqual("k", v: Long) => k.exists(_ >= v)
    case LessThan("k", v: Long) => k.exists(_ < v)
    case LessThanOrEqual("k", v: Long) => k.exists(_ <= v)
    case In("k", vs) => k.exists(x => vs.contains(x))
    case IsNull("k") => k.isEmpty
    case IsNotNull("k") => k.isDefined
    case EqualTo("s", v: String) => s.contains(v)
    case StringStartsWith("s", p) => s.exists(_.startsWith(p))
    case And(l, r) => evalRow(l, k, s) && evalRow(r, k, s)
    case Or(l, r) => evalRow(l, k, s) || evalRow(r, k, s)
    case other => sys.error(s"unexpected $other")
  }

  private val rowGen: Gen[(Option[Long], Option[String])] = for {
    k <- Gen.option(Gen.choose(-50L, 50L))
    s <- Gen.option(Gen.oneOf("", "a", "ab", "abc", "b", "bc", "zz"))
  } yield (k, s)

  private val leafGen: Gen[Filter] = Gen.oneOf(
    Gen.choose(-60L, 60L).map(v => EqualTo("k", v): Filter),
    Gen.choose(-60L, 60L).map(v => GreaterThan("k", v): Filter),
    Gen.choose(-60L, 60L).map(v => GreaterThanOrEqual("k", v): Filter),
    Gen.choose(-60L, 60L).map(v => LessThan("k", v): Filter),
    Gen.choose(-60L, 60L).map(v => LessThanOrEqual("k", v): Filter),
    Gen.listOfN(3, Gen.choose(-60L, 60L)).map(vs => In("k", vs.toArray.map(_.asInstanceOf[Any])): Filter),
    Gen.const(IsNull("k"): Filter),
    Gen.const(IsNotNull("k"): Filter),
    Gen.oneOf("", "a", "ab", "b", "c").map(v => EqualTo("s", v): Filter),
    Gen.oneOf("", "a", "ab", "b", "z").map(p => StringStartsWith("s", p): Filter))

  private val filterGen: Gen[Filter] = for {
    a <- leafGen; b <- leafGen; c <- leafGen
    combined <- Gen.oneOf(a, And(a, b): Filter, Or(a, b): Filter, And(Or(a, b), c): Filter)
  } yield combined

  test("pruning never skips a file that contains a matching row") {
    val caseGen = Gen.zip(Gen.nonEmptyListOf(rowGen), filterGen)
    val cases = samples(caseGen, 2000)
    assert(cases.size > 1500, "generator should produce most samples")
    cases.foreach { case (rows, f) =>
      val anyMatch = rows.exists { case (k, s) => evalRow(f, k, s) }
      val kept = StatsPruner.mayMatch(f, entryFor(rows), schema)
      // soundness: a real match forces keep (completeness is best-effort)
      assert(!anyMatch || kept, s"unsound skip: filter=$f rows=$rows")
    }
  }

  test("pruning actually skips in the clear cases") {
    val e = entryFor(Seq((Some(10L), Some("ab")), (Some(20L), Some("b"))))
    assert(!StatsPruner.mayMatch(EqualTo("k", 5L), e, schema))
    assert(!StatsPruner.mayMatch(GreaterThan("k", 20L), e, schema))
    assert(!StatsPruner.mayMatch(LessThan("k", 10L), e, schema))
    assert(!StatsPruner.mayMatch(IsNull("k"), e, schema))
    assert(!StatsPruner.mayMatch(StringStartsWith("s", "zz"), e, schema))
    assert(!StatsPruner.mayMatch(In("k", Array(1L, 2L)), e, schema))
    // unknown shapes stay conservative
    assert(StatsPruner.mayMatch(Not(EqualTo("k", 10L)), e, schema))
  }
}
