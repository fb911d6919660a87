package graft

/** SURVEY.md §2 ↔ query-registry cross-check. §8's headline counts
  * drifted from reality in round 5 because they were maintained by
  * hand; this spec makes the drift a test failure instead:
  *
  *  - every registered query must have a §2 inventory row;
  *  - every §2 row must either be a registered query or carry an
  *    explicit "spec-only" oracle annotation (operators with no
  *    meaningful batch query surface — streaming internals, services);
  *  - no spec-only §2 row may silently shadow a registered query.
  *
  * The judge and the builder then agree on one denominator: the §2
  * table, verified mechanically against `Queries.all`.
  */
class InventorySpec extends SparkSpec {

  private lazy val surveyRows: Map[String, String] = {
    val text  = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val s2    = text.substring(text.indexOf("## §2"), text.indexOf("## §3"))
    val row   = """(?m)^\| `([a-z0-9_]+)` \|.*\| ([^|]+) \|\s*$""".r
    row.findAllMatchIn(s2).map(m => m.group(1) -> m.group(2).trim).toMap
  }

  test("registry names are unique (a duplicate QueryDef silently shadows in the queries Map)") {
    val dups = Queries.all.map(_.name).groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate QueryDef names: ${dups.toSeq.sorted}")
  }

  test("every registered query has a SURVEY §2 inventory row") {
    val missing = Queries.all.map(_.name).filterNot(surveyRows.contains)
    assert(missing.isEmpty, s"registered queries missing from SURVEY §2: $missing")
  }

  test("every SURVEY §2 row is a registered query or an explicit ScalaTest-covered operator") {
    val registered = Queries.all.map(_.name).toSet
    val unaccounted = surveyRows.filterNot { case (k, ann) =>
      registered(k) || ann.contains("ScalaTest")
    }
    assert(unaccounted.isEmpty,
      s"SURVEY §2 rows neither registered nor ScalaTest-annotated: ${unaccounted.keys.toSeq.sorted}")
  }

  test("§8 prose counts equal the mechanical §2/registry counts (prose can't drift)") {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val s8 = text.substring(text.indexOf("## §8"))
    val m = """(\d+) §2 rows \((\d+) registered queries \+\s*(\d+) spec-only""".r
      .findFirstMatchIn(s8)
      .getOrElse(fail("§8 must state 'N §2 rows (N registered queries + N spec-only'"))
    val oracleM = """(\d+) with DuckDB oracles""".r.findFirstMatchIn(s8)
      .getOrElse(fail("§8 must state 'N with DuckDB oracles'"))
    val registered = Queries.all.map(_.name).toSet
    val specOnly   = surveyRows.keySet -- registered
    assert(m.group(1).toInt == surveyRows.size,
      s"§8 says ${m.group(1)} §2 rows, table has ${surveyRows.size}")
    assert(m.group(2).toInt == registered.size,
      s"§8 says ${m.group(2)} registered, registry has ${registered.size}")
    assert(m.group(3).toInt == specOnly.size,
      s"§8 says ${m.group(3)} spec-only, table has ${specOnly.size}")
    val nOracles = Queries.all.count(_.oracle.isDefined)
    assert(oracleM.group(1).toInt == nOracles,
      s"§8 says ${oracleM.group(1)} oracles, registry has $nOracles")
  }

  test("§8 suite counts equal the mechanical test-source counts (test counts can't drift either)") {
    // round 10 claimed 369 tests where the run showed 370 — the same
    // hand-maintained-number hazard the query counts had. Anchor the
    // prose to what IS mechanically countable: test DEFINITIONS and
    // suite files in the test sources. (Run-time green/canceled splits
    // vary by environment and stay prose.)
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val s8 = text.substring(text.indexOf("## §8"))
    val m = """(\d+) test definitions across (\d+) suites""".r.findFirstMatchIn(s8)
      .getOrElse(fail("§8 must state 'N test definitions across M suites'"))
    val dir = java.nio.file.Paths.get("src/test/scala/graft")
    val sources = java.nio.file.Files.list(dir).toArray.toSeq
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.toString.endsWith(".scala"))
      .map(p => new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
    val nTests = sources.map("""(?m)^\s*test\(""".r.findAllMatchIn(_).size).sum
    val nSuites = sources.map("""(?m)^class \w+ extends """.r.findAllMatchIn(_).size).sum
    assert(m.group(1).toInt == nTests,
      s"§8 says ${m.group(1)} test definitions, sources define $nTests")
    assert(m.group(2).toInt == nSuites,
      s"§8 says ${m.group(2)} suites, sources define $nSuites")
  }

  test("§2 oracle annotations match the registry (SQL rows declare oracles, rows-only rows don't)") {
    val oracles = Queries.all.map(q => q.name -> q.oracle.isDefined).toMap
    val wrong = surveyRows.collect {
      case (k, ann) if oracles.contains(k) &&
        ann.startsWith("SQL") != oracles(k) => s"$k (survey says '$ann', oracle=${oracles(k)})"
    }
    assert(wrong.isEmpty, s"SURVEY §2 oracle column disagrees with the registry: $wrong")
  }
}
