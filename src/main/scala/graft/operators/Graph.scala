package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph operators for dedup canonicalization: near-duplicate candidate
  * pairs (Dedup.lshPairs) form an undirected graph whose connected
  * components are the duplicate clusters — keep min(doc_id) per component
  * as the canonical document, drop the rest. The step every large-scale
  * training-data dedup pipeline runs after MinHash/LSH.
  *
  * Mirrors the reference's implicit namespace graph handling (SURVEY.md
  * §1.1: parentHash edges + children adjacency, maintained by per-event
  * upserts in `src/lib/services/mongodb.ts:147-195`) — re-expressed as
  * whole-graph DataFrame iteration instead of point updates.
  */
object Graph {

  type Q = (SparkSession, String) => DataFrame

  /** Connected components by iterative min-label propagation.
    *
    * Each round every node takes the min label over itself and its
    * neighbors; converges in O(diameter) rounds. LSH duplicate clusters
    * are near-cliques (diameter ≤ 2-3), so this beats the O(log n)
    * large-star/small-star scheme there — propagation does whole-cluster
    * hops per round and each round is just a join + groupBy.min. For
    * graphs with long chains, switch to alternating large/small-star
    * (Kiveris et al., "Connected Components in MapReduce") — same
    * DataFrame skeleton, different propagation rule.
    *
    * Each iteration localCheckpoints the label frame: the loop would
    * otherwise double the lineage per round and recompile ever-growing
    * plans (driver-side O(2^iter) analysis).
    *
    * @param edges two-column DataFrame of undirected edges
    * @return (node, cluster) — cluster is the component's min node id
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // The sum-potential convergence check below is exact only for
    // integral ids (decimal cast of a fractional/string id would round or
    // null out and corrupt the check silently) — enforce rather than
    // guess. Map other id types to longs (zipWithUniqueId / xxhash64)
    // before calling.
    edges.schema.fields.take(2).foreach { f =>
      require(Set("byte", "short", "integer", "long")(f.dataType.typeName),
        s"connectedComponents needs integral node ids; ${f.name} is ${f.dataType.typeName}")
    }
    val Seq(ca, cb) = edges.columns.toSeq.take(2).map(col)
    val und = edges.select(ca.as("x"), cb.as("y"))
      .union(edges.select(cb.as("x"), ca.as("y")))
      .distinct()
      .persist()
    var labels = und.select(col("x").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    // Convergence check: labels are min-monotone (each round every label
    // either stays or strictly decreases, node set fixed), so the label
    // sum is a strictly decreasing potential — "sum unchanged" ⟺
    // converged. One cheap aggregate per round instead of a self-join
    // diff; decimal(38,0) so huge graphs can't overflow the potential.
    def potential(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
    var prevPot = potential(labels) // null on an empty graph → converged
    var iter = 0
    var converged = prevPot == null
    while (!converged && iter < maxIter) {
      val neighborMin = und
        .join(labels.withColumnRenamed("node", "y").withColumnRenamed("label", "ylabel"), Seq("y"))
        .select(col("x").as("node"), col("ylabel").as("label"))
      val next = neighborMin.union(labels)
        .groupBy("node").agg(min("label").as("label"))
        .localCheckpoint()
      val pot = potential(next)
      labels = next
      converged = pot.compareTo(prevPot) == 0
      prevPot = pot
      iter += 1
    }
    und.unpersist()
    // Unconverged labels are WRONG labels (a component reported as several
    // clusters) and indistinguishable from right ones — refuse to return
    // them. Graphs with diameter > maxIter need a larger budget or the
    // large/small-star rule.
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds " +
        "(graph diameter exceeds the iteration budget)")
    labels.select(col("node"), col("label").as("cluster"))
  }

  /** cc — duplicate clusters over the LSH candidate pairs (same probe set
    * as dd_lsh_pairs): each doc in a candidate pair labeled with its
    * component's min doc_id.
    */
  val ccClusters: Q = (s, d) => {
    import s.implicits._
    connectedComponents(Dedup.lshPairs(s, d))
      .select($"node".as("doc_id"), $"cluster")
      .orderBy($"doc_id")
  }
  val ccClustersSql: String = {
    val mins = (0 until 8).map(j => s"min(md5('$j:' || sh)) AS mh$j").mkString(", ")
    s"""WITH RECURSIVE sig AS (
       |  SELECT doc_id, $mins
       |  FROM (SELECT doc_id,
       |               unnest(list_transform(range(1, len(text)-3), i -> substr(text, i, 5))) AS sh
       |        FROM documents WHERE doc_id < 200 AND len(text) >= 5)
       |  GROUP BY doc_id),
       |banded AS (
       |  SELECT doc_id, 0 AS band, md5(mh0 || '|' || mh1 || '|' || mh2 || '|' || mh3) AS bsig FROM sig
       |  UNION ALL
       |  SELECT doc_id, 1 AS band, md5(mh4 || '|' || mh5 || '|' || mh6 || '|' || mh7) AS bsig FROM sig),
       |pairs AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM banded x JOIN banded y ON x.band = y.band AND x.bsig = y.bsig
       |  WHERE x.doc_id < y.doc_id),
       |und AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b AS x, a AS y FROM pairs),
       |reach(n, r) AS (
       |  SELECT x, x FROM und
       |  UNION
       |  SELECT u.y, reach.r FROM und u JOIN reach ON u.x = reach.n)
       |SELECT n AS doc_id, CAST(min(r) AS BIGINT) AS cluster
       |FROM reach GROUP BY n ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, Q] = Map("cc_clusters" -> ccClusters)
  val oracles: Map[String, String] = Map("cc_clusters" -> ccClustersSql)
}
