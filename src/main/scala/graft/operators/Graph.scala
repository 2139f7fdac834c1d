package graft.operators

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.CheckpointBridge
import graft.Tables.{t => tbl}

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
  // The convergence checks in both algorithms are exact only for integral
  // ids (decimal cast of a fractional/string id would round or null out
  // and corrupt the check silently) — enforce rather than guess. Map
  // other id types to longs (zipWithUniqueId / xxhash64) before calling.
  // Edges with a null endpoint carry no connectivity information and
  // would label-propagate asymmetrically — both algorithms drop them so
  // the two entry points stay interchangeable.
  private def cleanEdges(edges: DataFrame, opName: String): DataFrame = {
    edges.schema.fields.take(2).foreach { f =>
      require(Set("byte", "short", "integer", "long")(f.dataType.typeName),
        s"$opName needs integral node ids; ${f.name} is ${f.dataType.typeName}")
    }
    val Seq(ca, cb) = edges.columns.toSeq.take(2).map(col)
    edges.select(ca.as("a"), cb.as("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
  }

  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val e = cleanEdges(edges, "connectedComponents")
    val und = e.select(col("a").as("x"), col("b").as("y"))
      .union(e.select(col("b").as("x"), col("a").as("y")))
      .distinct()
      .persist()
    // Convergence check: labels are min-monotone (each round every label
    // either stays or strictly decreases, node set fixed), so the label
    // sum is a strictly decreasing potential — "sum unchanged" ⟺
    // converged. The potential rides the SAME job that materializes the
    // round's checkpoint (Observation metrics are collected as a
    // side-output of the localCheckpoint action), so each round is ONE
    // Spark job, not checkpoint + a separate aggregate — at gate scale
    // the loop is scheduling-bound and this halves it; at cluster scale
    // it halves driver round-trips. decimal(38,0) so huge graphs can't
    // overflow the potential.
    def checkpointWithPotential(df: DataFrame): (DataFrame, java.math.BigDecimal) = {
      val obs = Observation()
      val out = df
        .observe(obs, sum(col("label").cast("decimal(38,0)")).as("pot"))
        .localCheckpoint()
      (out, obs.get.get("pot").orNull.asInstanceOf[java.math.BigDecimal])
    }
    var (labels, prevPot) = checkpointWithPotential(
      und.select(col("x").as("node")).distinct().withColumn("label", col("node")))
    var iter = 0
    var converged = prevPot == null // null on an empty graph → converged
    while (!converged && iter < maxIter) {
      val neighborMin = und
        .join(labels.withColumnRenamed("node", "y").withColumnRenamed("label", "ylabel"), Seq("y"))
        .select(col("x").as("node"), col("ylabel").as("label"))
      val (next, pot) = checkpointWithPotential(
        neighborMin.union(labels).groupBy("node").agg(min("label").as("label")))
      // next is fully materialized (eager localCheckpoint), so the prior
      // round's blocks are dead — free them now instead of letting every
      // round's label table pile up in executor storage memory until the
      // ContextCleaner happens to run (at 100 TB a label table is
      // O(|nodes|); maxIter leaked copies would evict real caches).
      CheckpointBridge.freeCheckpoint(labels)
      labels = next
      converged = pot.compareTo(prevPot) == 0
      prevPot = pot
      iter += 1
    }
    und.unpersist()
    // Unconverged labels are WRONG labels (a component reported as several
    // clusters) and indistinguishable from right ones — refuse to return
    // them. Graphs with diameter > maxIter need a larger budget or the
    // large/small-star rule. Free the final checkpoint before throwing —
    // callers that retry (e.g. the bench loop swallows failures) must not
    // accumulate one orphaned label table per attempt.
    if (!converged) {
      CheckpointBridge.freeCheckpoint(labels)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          "(graph diameter exceeds the iteration budget)")
    }
    labels.select(col("node"), col("label").as("cluster"))
  }

  /** Connected components by alternating large-star/small-star (Kiveris
    * et al., "Connected Components in MapReduce and Beyond", 2014) — the
    * scale path for graphs whose diameter exceeds a sane round budget.
    * Min-label propagation (above) does one hop per round = O(diameter)
    * rounds; the star operations contract whole subtrees onto their
    * minimum per round and converge in O(log n) rounds regardless of
    * diameter — a 1M-hop chain resolves in ~20 rounds, not 1M.
    *
    * Each operation is a groupBy.min + join-back on the edge list (never
    * collect_list — per-node neighbor sets stay distributed, so a
    * 100M-degree hub can't OOM a task). Convergence = the canonical edge
    * set is a fixpoint of both stars, detected by (count, xxhash64-sum)
    * over the edge set collected by the SAME job that checkpoints the
    * round (Observation); a false "converged" needs a 64-bit hash-sum
    * collision between consecutive rounds (~2^-64, documented risk of
    * the check, not the labels).
    *
    * @param edges two-column DataFrame of undirected edges (integral ids)
    * @return (node, cluster) — cluster is the component's min node id;
    *         matches connectedComponents on every input
    */
  def connectedComponentsStar(edges: DataFrame, maxIter: Int = 30): DataFrame = {
    // Evaluated twice after the loop (node-set union) on top of whatever
    // upstream pipeline produced the edges (LSH banding here) — persist so
    // the input pipeline runs once, not three times.
    val cleaned = cleanEdges(edges, "connectedComponentsStar").persist()

    // large-star: every node attaches its strictly-larger neighbors to
    // the min of its neighborhood (incl. itself).
    def largeStar(e: DataFrame): DataFrame = {
      val und = e.union(e.select(col("b").as("a"), col("a").as("b")))
      val mins = und.groupBy(col("a")).agg(min(col("b")).as("mn"))
        .select(col("a"), least(col("mn"), col("a")).as("m"))
      und.join(mins, "a").where(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
    }
    // small-star: every node attaches its smaller neighbors (and itself)
    // to the min of those.
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.where(col("a") =!= col("b")).select(
        greatest(col("a"), col("b")).as("a"), least(col("a"), col("b")).as("b"))
      val mins = dir.groupBy(col("a")).agg(min(col("b")).as("m"))
      dir.join(mins, "a").select(col("b").as("a"), col("m").as("b"))
        .union(mins.select(col("a"), col("m").as("b")))
        .where(col("a") =!= col("b"))
    }

    def canon(e: DataFrame): DataFrame = e.where(col("a") =!= col("b")).select(
      greatest(col("a"), col("b")).as("a"), least(col("a"), col("b")).as("b"))
      .distinct()

    def checkpointWithSig(df: DataFrame): (DataFrame, (Long, java.math.BigDecimal)) = {
      val obs = Observation()
      val out = df.observe(obs,
        count(lit(1)).as("n"),
        sum(xxhash64(col("a"), col("b")).cast("decimal(38,0)")).as("h"))
        .localCheckpoint()
      val m = obs.get
      (out, (m("n").asInstanceOf[Long],
        m.get("h").orNull.asInstanceOf[java.math.BigDecimal]))
    }

    var (cur, sig) = checkpointWithSig(canon(cleaned))
    var iter = 0
    var converged = sig._1 == 0L // edgeless graph: nothing to label below
    while (!converged && iter < maxIter) {
      val (next, nextSig) = checkpointWithSig(canon(smallStar(largeStar(cur))))
      CheckpointBridge.freeCheckpoint(cur) // superseded round, see connectedComponents
      converged = nextSig == sig
      cur = next
      sig = nextSig
      iter += 1
    }
    if (!converged) { // free before throwing, see connectedComponents
      cleaned.unpersist(blocking = false)
      CheckpointBridge.freeCheckpoint(cur)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge in $maxIter rounds")
    }
    // Fixpoint edge set is a union of stars (a = member, b = root min).
    // Left-join back onto the full node set so nodes whose only edges
    // were self-loops (dropped by canon) still label themselves — same
    // contract as connectedComponents.
    val nodes = cleaned.select(col("a").as("node"))
      .union(cleaned.select(col("b").as("node"))).distinct()
    // Eager checkpoint: materialize the O(|nodes|) labeling while
    // `cleaned` is still cached, then drop both the input cache and the
    // fixpoint edge set — the caller holds only the final small frame.
    val out = nodes.join(cur.withColumnRenamed("a", "node"), Seq("node"), "left")
      .select(col("node"), coalesce(col("b"), col("node")).as("cluster"))
      .localCheckpoint()
    cleaned.unpersist(blocking = false)
    CheckpointBridge.freeCheckpoint(cur)
    out
  }

  /** Incremental connected components: fold a batch of new edges into an
    * existing label table WITHOUT recomputing the full graph — the
    * missing piece that lets incremental dedup (Dedup.incrementalCandidates
    * banding a fresh batch against persisted corpus signatures) maintain
    * cluster labels end-to-end incrementally.
    *
    * Correctness: a label table preserves the old graph's connectivity
    * exactly (every component is a star node→cluster, and cluster is the
    * component MIN, so cluster ids are themselves member ids). Therefore
    * CC(old ∪ batch) = CC(starEdges(labels) ∪ batch), and the only labels
    * that can change are those of components touched by the batch. The
    * algorithm exploits that:
    *
    *   1. map each batch endpoint to its current cluster (left join; a
    *      node the labels have never seen is its own cluster),
    *   2. run CC on the resulting CLUSTER-level graph — O(|batch|) nodes,
    *      not O(|corpus|),
    *   3. broadcast the old→new cluster remap over the label table (only
    *      touched clusters move; min-of-merged-mins = min of the merged
    *      component, so labels stay canonical), and append rows for
    *      brand-new nodes.
    *
    * At 100 TB: the label table scans once through a broadcast hash join
    * (the remap is O(touched clusters), tiny by construction for any
    * sane ingest batch) — no O(|V|) shuffle, no iteration over the big
    * table. Matches connectedComponents(allEdges) on every input
    * (spec-asserted and oracle-gated by cc_incremental, whose DuckDB
    * ground truth recomputes the FULL graph).
    */
  def incrementalComponents(labels: DataFrame, newEdges: DataFrame): DataFrame = {
    val e = cleanEdges(newEdges, "incrementalComponents")
    val lab = labels.select(col("node"), col("cluster"))
    // batch edges lifted to the cluster graph
    val lifted = e
      .join(lab.select(col("node").as("a"), col("cluster").as("ca")), Seq("a"), "left")
      .join(lab.select(col("node").as("b"), col("cluster").as("cb")), Seq("b"), "left")
      .select(coalesce(col("ca"), col("a")).as("x"),
        coalesce(col("cb"), col("b")).as("y"))
    // tiny CC over touched clusters + new nodes; O(log) rounds regardless
    // of how many old components one batch chains together
    val remap = connectedComponentsStar(lifted)
      .select(col("node").as("cluster"), col("cluster").as("next"))
      .where(col("cluster") =!= col("next")) // identity moves are no-ops
    val updated = lab.join(broadcast(remap), Seq("cluster"), "left")
      .select(col("node"), coalesce(col("next"), col("cluster")).as("cluster"))
    // brand-new nodes: batch endpoints the label table has never seen.
    // Their cluster-graph id is themselves, so the (unfiltered) remap
    // carries their final label; identity-filtered entries mean "keep".
    val newNodes = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node"))).distinct()
      .join(lab.select(col("node")), Seq("node"), "left_anti")
    val added = newNodes
      .join(broadcast(remap.withColumnRenamed("cluster", "node")), Seq("node"), "left")
      .select(col("node"), coalesce(col("next"), col("node")).as("cluster"))
    updated.unionByName(added)
  }

  /** cc_incremental — the incremental path as a gate query: labels built
    * from the sub-150 slice of the LSH pair graph, then the remaining
    * pairs folded in via incrementalComponents. The DuckDB oracle is the
    * FULL-graph recursive-CTE labeling (shared with cc_clusters/cc_star),
    * so the gate hash-checks incremental ≡ batch recompute.
    */
  val ccIncremental: Q = (s, d) => {
    import s.implicits._
    val pairs = Dedup.lshPairs(s, d)
    val batch = pairs.where(!($"a" < 150 && $"b" < 150))
    incrementalComponents(seedLabels(s, d), batch)
      .select($"node".as("doc_id"), $"cluster")
      .orderBy($"doc_id")
  }

  /** The incremental gate's "existing label table" — in production this is
    * the persisted output of the last corpus snapshot's CC job, so it is
    * memoized per (session, sfDir) exactly like [[lshLabels]]: each
    * incremental fold then costs only the O(|batch|) cluster-graph CC,
    * never a rebuild of the seed labels.
    */
  private val seedLabelCache = new graft.SessionCache[String]
  private def seedLabels(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    seedLabelCache.getOrCompute(s, d)(
      connectedComponentsStar(Dedup.lshPairs(s, d).where($"a" < 150 && $"b" < 150)))
  }

  /** Cluster labels are the materialized product of an iterative job — a
    * production dedup pipeline computes them ONCE per corpus snapshot and
    * every downstream consumer (cluster listing, canonical selection,
    * keep/drop filters) reads the label table. Memoize per
    * (session, sfDir) accordingly; the frame is an eager localCheckpoint,
    * so the cache holds materialized blocks, not lineage. Same precedent
    * as HypermapQueries.decodedCache.
    */
  private val labelCache = new graft.SessionCache[String]
  private def lshLabels(s: SparkSession, d: String): DataFrame =
    labelCache.getOrCompute(s, d)(connectedComponents(Dedup.lshPairs(s, d)))

  /** cc — duplicate clusters over the LSH candidate pairs (same probe set
    * as dd_lsh_pairs): each doc in a candidate pair labeled with its
    * component's min doc_id.
    */
  val ccClusters: Q = (s, d) => {
    import s.implicits._
    lshLabels(s, d)
      .select($"node".as("doc_id"), $"cluster")
      .orderBy($"doc_id")
  }
  /** Shared recursive-CTE ground truth for the LSH pair graph (same probe
    * set + banding as Dedup.lshPairs): everything through `reach` is the
    * component labeling; ccClustersSql and ddCanonicalSql both build on
    * it so the LSH parameters live in ONE place.
    */
  private val ccReachCte: String = {
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
       |  SELECT u.y, reach.r FROM und u JOIN reach ON u.x = reach.n)""".stripMargin
  }

  val ccClustersSql: String =
    s"""$ccReachCte
       |SELECT n AS doc_id, CAST(min(r) AS BIGINT) AS cluster
       |FROM reach GROUP BY n ORDER BY doc_id""".stripMargin

  /** cc via alternating stars — identical clusters to cc_clusters, taken
    * through the O(log n)-round path, oracle-checked against the same
    * recursive-CTE ground truth.
    */
  val ccStarClusters: Q = (s, d) => {
    import s.implicits._
    connectedComponentsStar(Dedup.lshPairs(s, d))
      .select($"node".as("doc_id"), $"cluster")
      .orderBy($"doc_id")
  }

  /** Cluster-representative selection — the step a dedup pipeline runs
    * AFTER clustering: per duplicate cluster keep ONE canonical document
    * (longest text wins, min doc_id on ties — any deterministic quality
    * key slots in) and count what gets dropped. One broadcast-able join
    * (cluster labels are O(candidate docs), tiny next to the corpus) and
    * one keyed aggregation — at 100 TB the corpus never shuffles: the
    * final keep/drop filter is a broadcast semi-join against the drop set.
    *
    * Tie-break encoding: (n_chars, -doc_id) packed into one exact double
    * (n_chars ≤ 2^20, doc_id ≤ 2^31 ⇒ n_chars*2^31+doc_id < 2^52) so the
    * same max_by works verbatim in both engines.
    */
  val ddCanonical: Q = (s, d) => {
    import s.implicits._
    val labels = lshLabels(s, d)
    val docs = tbl(s, d, "documents").select($"doc_id", $"n_chars")
    labels.join(docs, $"node" === $"doc_id")
      .groupBy($"cluster")
      .agg(
        max_by($"doc_id", $"n_chars" * lit(2147483648L) - $"doc_id").as("keep_doc"),
        count(lit(1)).as("members"),
        max($"n_chars").as("keep_chars"))
      .where($"members" > 1)
      .orderBy($"cluster")
  }
  val ddCanonicalSql: String =
    s"""$ccReachCte,
       |lab AS (SELECT n AS doc_id, CAST(min(r) AS BIGINT) AS cluster FROM reach GROUP BY n)
       |SELECT cluster,
       |       max_by(d.doc_id, d.n_chars * 2147483648 - d.doc_id) AS keep_doc,
       |       count(*) AS members,
       |       max(d.n_chars) AS keep_chars
       |FROM lab JOIN documents d USING (doc_id)
       |GROUP BY cluster HAVING count(*) > 1 ORDER BY cluster""".stripMargin

  val queries: Map[String, Q] = Map(
    "cc_clusters"    -> ccClusters,
    "cc_star"        -> ccStarClusters,
    "cc_incremental" -> ccIncremental,
    "dd_canonical"   -> ddCanonical)
  val oracles: Map[String, String] = Map(
    "cc_clusters"    -> ccClustersSql,
    "cc_star"        -> ccClustersSql,
    "cc_incremental" -> ccClustersSql,
    "dd_canonical"   -> ddCanonicalSql)
}
