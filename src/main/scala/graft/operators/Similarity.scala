package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.{t => tbl}

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * - Brute-force cosine top-k: the correctness baseline — probe set ×
  *   corpus, exact cosine in double, windowed top-k. O(|Q|·N·dim) — fine
  *   for re-ranking and for verifying the approximate path.
  * - Random-hyperplane LSH buckets: the scale path — 8-bit signatures from
  *   deterministic pseudo-random hyperplanes (sign pattern derived from
  *   md5 parities, so signatures are reproducible across runs and
  *   engines). At 100 TB: bucket once (one shuffle), then probe only
  *   matching buckets (multi-probe = flip one bit), turning ANN into a
  *   bucket-equi-join. IVF (k-means coarse quantizer) drops into the same
  *   bucket-join shape with learned centroids.
  */
object Similarity {

  type Q = (SparkSession, String) => DataFrame

  private val Dim = 64
  private val Planes = 8

  /** Fused cosine kernel (CosineSim expression) — identical arithmetic to
    * the SQL-lambda formulation, one codegen'd loop, no intermediate
    * arrays.
    */
  private def cos(ea: String, eb: String) =
    graft.functions.vector.cosine_sim(col(ea), col(eb))

  /** Brute-force top-3 cosine neighbors for probe vectors vec_id < 5. */
  val annBruteforce: Q = (s, d) => {
    val e = tbl(s, d, "embeddings")
    val probes = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("q"), col("embedding").as("eq"))
    val corpus = e.select(col("vec_id").as("n"), col("embedding").as("en"))
    val scored = probes.crossJoin(corpus).where(col("q") =!= col("n"))
      .select(col("q"), col("n"), round(cos("eq", "en"), 6).as("cos"))
    val w = Window.partitionBy(col("q")).orderBy(col("cos").desc, col("n"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3)
      .orderBy(col("q"), col("rank"))
  }
  val annBruteforceSql: String =
    """SELECT q, n, cos, rank FROM (
      |  SELECT q, n, cos,
      |         row_number() OVER (PARTITION BY q ORDER BY cos DESC, n) AS rank
      |  FROM (
      |    SELECT x.vec_id AS q, y.vec_id AS n,
      |           round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
      |                                        CAST(y.embedding AS DOUBLE[])), 6) AS cos
      |    FROM embeddings x JOIN embeddings y ON x.vec_id != y.vec_id
      |    WHERE x.vec_id < 5))
      |WHERE rank <= 3 ORDER BY q, rank""".stripMargin

  /** Deterministic pseudo-random hyperplane signs: ±1 per (plane, dim)
    * from md5 parity — reproducible everywhere, no RNG state.
    */
  private[operators] def planeSigns(nPlanes: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nPlanes, Dim) { (p, i) =>
      md.reset()
      val h = md.digest(s"$p:$i".getBytes("UTF-8"))
      if ((h(0) & 1) == 1) 1.0 else -1.0
    }
  }

  /** LSH bucket id per vector: bit p = sign(dot(embedding, plane_p)).
    * One fused PlaneBucket kernel evaluates all planes per row.
    */
  def withLshBucket(e: DataFrame): DataFrame = {
    val signs = planeSigns(Planes)
    val weights = Array.tabulate(Planes)(p => 1L << p)
    e.withColumn("bucket",
      graft.functions.vector.plane_bucket(col("embedding"), signs, weights))
  }

  /** Multi-table bucketing: `tables` independent signatures of
    * `bitsPerTable` bits each → exploded (table, bucket) rows. Recall
    * scales as 1-(1-p^b)^L while each table's bucket join stays cheap —
    * the standard random-hyperplane trade (Indyk-Motwani LSH).
    */
  def withLshTables(e: DataFrame, tables: Int, bitsPerTable: Int): DataFrame = {
    val signs = planeSigns(tables * bitsPerTable)
    val weights = Array.tabulate(bitsPerTable)(j => 1L << j)
    val tableCols = (0 until tables).map { t =>
      val slice = signs.slice(t * bitsPerTable, (t + 1) * bitsPerTable)
      struct(lit(t).as("tbl"),
        graft.functions.vector.plane_bucket(col("embedding"), slice, weights)
          .as("bucket"))
    }
    e.withColumn("tb", explode(array(tableCols: _*)))
      .withColumn("tbl", col("tb.tbl")).withColumn("bucket", col("tb.bucket"))
      .drop("tb")
  }

  /** Bucket histogram — the rows-only gate query for the LSH path (recall
    * vs brute force is asserted in SimilaritySpec).
    */
  val annLshBuckets: Q = (s, d) => {
    withLshBucket(tbl(s, d, "embeddings"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))
  }

  /** ANN via multi-table bucket join (the scale path): candidates share any
    * table's bucket; exact cosine only on distinct candidates; top-k per
    * probe. One shuffle on (table, bucket), one on the candidate distinct.
    */
  def annViaLsh(e: DataFrame, probeIds: Seq[Long], k: Int = 3,
                tables: Int = 16, bitsPerTable: Int = 4): DataFrame = {
    val b = withLshTables(e, tables, bitsPerTable)
    val probes = b.where(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id").as("q"), col("tbl"), col("bucket"))
    val cands = b.select(col("vec_id").as("n"), col("tbl"), col("bucket"))
    val pairs = probes.join(cands, Seq("tbl", "bucket"))
      .where(col("q") =!= col("n"))
      .select(col("q"), col("n")).distinct()
    val vecs = e.select(col("vec_id"), col("embedding"))
    val scored = pairs
      .join(vecs.select(col("vec_id").as("q"), col("embedding").as("eq")), Seq("q"))
      .join(vecs.select(col("vec_id").as("n"), col("embedding").as("en")), Seq("n"))
      .select(col("q"), col("n"), cos("eq", "en").as("cos"))
    val w = Window.partitionBy(col("q")).orderBy(col("cos").desc, col("n"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  val queries: Map[String, Q] = Map(
    "ann_bruteforce"  -> annBruteforce,
    "ann_lsh_buckets" -> annLshBuckets,
  )

  /** ann_lsh_buckets is deliberately rows-only (no oracle): the md5-parity
    * hyperplanes are Spark-side constants.
    */
  val oracles: Map[String, String] = Map(
    "ann_bruteforce" -> annBruteforceSql,
  )
}
