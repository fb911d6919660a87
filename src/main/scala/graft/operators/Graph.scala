package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over DERIVED bounded graphs. The 100 TB pattern all
  * of these share: ONE distributed pass reduces the corpus to a
  * vocabulary-bounded edge table (e.g. [[Funnel.transitionMatrix]] —
  * |event types|² rows from one user-keyed window; or
  * [[Curation.sourceOverlap]] — |sources|² rows), and the iterative
  * part then runs over that bounded table where iteration is cheap.
  * Complements the label-propagation connected components in
  * [[Dedup.survivors]], which iterates distributed because ITS graph
  * (the dup-pair graph) is not bounded.
  */
object Graph {

  /** Weighted PageRank in exact integer fixed-point over a BOUNDED edge
    * table: pr'(i) = (1−d)/n + d·Σ_j pr(j)·w(j→i)/out(j), evaluated as
    *
    *   pr'(i) = (15·S) div (100·n) + (85·Σ_j (pr(j)·w(j,i) div out(j))) div 100
    *
    * with S = 1e9 fixed-point scale and every operation an exact
    * truncating integer op — the same expression an ANSI-SQL oracle
    * evaluates with `//`, so ranks are engine-exact and reproducible
    * (no float accumulation, no ulp drift across iteration counts).
    *
    * The edge table must be derivation-bounded (require'd): the power
    * iteration runs on the driver in BigInt over ≤ maxEdges rows —
    * deterministic, overflow-free, and O(iterations·edges) which is
    * noise next to the corpus pass that DERIVED the edges. Dangling
    * nodes (no out-edges) leak their mass, the standard simplification;
    * rank ORDER is unaffected for the diagnostic uses this serves.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String, weightCol: String,
      iterations: Int = 6, maxEdges: Int = 100000): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val rows = edges
      .select(col(srcCol).cast("string"), col(dstCol).cast("string"), col(weightCol).cast("long"))
      .as[(String, String, Long)].collect()
    require(rows.length <= maxEdges,
      s"pageRank expects a derivation-bounded edge table: got ${rows.length} > $maxEdges edges")
    val nodes = (rows.map(_._1) ++ rows.map(_._2)).distinct.sorted
    require(nodes.nonEmpty, "pageRank needs at least one edge")
    val n    = BigInt(nodes.length)
    val S    = BigInt(1000000000L)
    val outW = rows.groupBy(_._1).view.mapValues(g => BigInt(g.map(_._3).sum)).toMap
    val base = (BigInt(15) * S) / (BigInt(100) * n)
    var pr   = nodes.map(_ -> S / n).toMap
    for (_ <- 1 to iterations) {
      val acc = scala.collection.mutable.Map.empty[String, BigInt].withDefaultValue(BigInt(0))
      for ((s, d, w) <- rows) acc(d) += (pr(s) * BigInt(w)) / outW(s)
      pr = nodes.map(v => v -> (base + (BigInt(85) * acc(v)) / BigInt(100))).toMap
    }
    nodes.map(v => (v, pr(v).toLong)).toSeq.toDF("node", "pr_fp")
  }

  /** The matching DuckDB/ANSI oracle for [[pageRank]] over an edge CTE:
    * unrolled chained CTEs (one per iteration — no recursive-CTE
    * aggregation, which older engines reject), every step the same
    * truncating integer expression. `edgesCte` must define `edges(src,
    * dst, w)`.
    */
  def pageRankOracleSql(edgesCte: String, iterations: Int = 6): String = {
    val steps = (1 to iterations).map { i =>
      s"""pr$i AS (
         |  SELECT n.node,
         |         (15 * CAST(1000000000 AS BIGINT)) // (100 * (SELECT n FROM nn))
         |           + (85 * COALESCE(s.acc, 0)) // 100 AS pr
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, sum((p.pr * e.w) // o.outw) AS acc
         |    FROM pr${i - 1} p JOIN edges e ON e.src = p.node JOIN outs o ON o.node = p.node
         |    GROUP BY e.dst) s ON s.node = n.node
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgesCte,
       |nodes AS (
       |  SELECT DISTINCT node FROM (SELECT src AS node FROM edges UNION SELECT dst FROM edges)
       |),
       |outs AS (SELECT src AS node, sum(w) AS outw FROM edges GROUP BY 1),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |pr0 AS (SELECT node, CAST(1000000000 AS BIGINT) // (SELECT n FROM nn) AS pr FROM nodes),
       |$steps
       |SELECT node, CAST(pr AS BIGINT) AS pr_fp FROM pr$iterations ORDER BY node""".stripMargin
  }
}
