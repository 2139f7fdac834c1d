package graft

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** True-scale corpus generator: `runMain graft.GenScale [outDir] [mult]`
  * materializes a sf0.1×mult directory (default /tmp/graft-sf1, mult=10 →
  * sf1) for the three corpus tables — events, documents, embeddings —
  * and copies the TPC-H side tables unchanged.
  *
  * Unlike ScaleProbe's replication (which reuses sf0.1 rows and must
  * argue replicas don't interact), this generates FRESH rows with the
  * sf0.1 tables' schemas and distributions: documents draw tokens from
  * the observed frequency-weighted vocabulary with the observed 10–100
  * uniform length; events keep the 30-day window, the 5-way type mix,
  * and the ~67 events/user density (user range scales with mult);
  * embeddings keep dim 64 with 10 label-centroid clusters + noise. Every
  * field derives from xxhash64 of the row id — fully deterministic, no
  * RNG state, generated distributively by spark.range (never a driver
  * loop). The small per-table `.collect()`s pull only distinct
  * lang/source/type values and a 31-token vocabulary — driver-bounded.
  *
  * Output feeds `Bench` via SPARK_GRAFT_SF_DIR (+ the opt-in
  * SPARK_GRAFT_BENCH_FILTER) to measure sf0.1→sf1 wall-clock ratios on
  * the corpus headliners; PERF.md records the results. Correctness gates
  * keep using the driver's own sf dirs — this data is for timing, its
  * hashes mean nothing.
  */
object GenScale {

  /** hash → [0, n) as long, seeded by a tag so fields are independent. */
  private def h(n: Long, tag: Int, cols: Column*): Column =
    pmod(xxhash64((lit(tag) +: cols): _*), lit(n))

  /** Frequency-weighted value array: each distinct value of `c` appears
    * ≥1 and ∝-frequency times in ~`slots` slots, preserving the observed
    * mix under uniform-hash indexing.
    */
  private def weightedValues(df: DataFrame, c: String, slots: Int): Seq[String] = {
    val counts = df.groupBy(col(c)).count().orderBy(col(c))
      .collect().map(r => (r.get(0).toString, r.getLong(1))).toSeq
    val total = counts.map(_._2).sum.toDouble
    counts.flatMap { case (v, n) =>
      Seq.fill(math.max(1, math.round(n / total * slots).toInt))(v)
    }
  }

  private def pick(values: Seq[String], tag: Int, id: Column): Column =
    element_at(array(values.map(lit): _*),
      (h(values.size.toLong, tag, id) + 1).cast("int"))

  def genDocuments(spark: SparkSession, src: String, mult: Int): DataFrame = {
    val docs = Tables.documents(spark, src)
    val n = docs.count()
    val vocab = weightedValues(
      docs.select(explode(split(col("text"), " ")).as("tok")), "tok", 500)
    val langs = weightedValues(docs, "lang", 50)
    val sources = weightedValues(docs, "source", 100)
    val vocabArr = array(vocab.map(lit): _*)
    val text = array_join(
      transform(
        sequence(lit(1), (lit(10) + h(91, 1, col("id"))).cast("int")),
        i => element_at(vocabArr,
          (pmod(xxhash64(lit(2), col("id"), i), lit(vocab.size.toLong)) + 1)
            .cast("int"))),
      " ")
    spark.range(n * mult)
      .select(col("id").as("doc_id"), text.as("text"),
        pick(langs, 3, col("id")).as("lang"),
        pick(sources, 4, col("id")).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  def genEvents(spark: SparkSession, src: String, mult: Int): DataFrame = {
    val ev = Tables.events(spark, src)
    val n = ev.count()
    val nUsers = 1500L * mult
    val types = weightedValues(ev, "event_type", 100)
    val baseNanos = 1704067200L * 1000000000L // 2024-01-01T00:00:00Z
    val windowNanos = 30L * 86400 * 1000000000L
    spark.range(n * mult)
      .select(col("id").as("event_id"),
        (lit(baseNanos) + h(windowNanos, 5, col("id"))).as("ts"),
        h(nUsers, 6, col("id")).as("user_id"),
        pick(types, 7, col("id")).as("event_type"),
        round(h(56022L, 8, col("id")) / 100.0, 2).as("value"),
        concat(lit("{\"k\": "), h(100, 9, col("id")), lit("}")).as("props"))
  }

  def genEmbeddings(spark: SparkSession, src: String, mult: Int): DataFrame = {
    val n = Tables.embeddings(spark, src).count()
    // signed [-1,1] hash double
    def s(tag: Int, cols: Column*): Column =
      (pmod(xxhash64((lit(tag) +: cols): _*), lit(2001L)) - 1000L) / 1000.0
    val label = h(10, 10, col("id"))
    val emb = transform(sequence(lit(0), lit(63)),
      i => (s(11, label, i) * 0.25 + s(12, col("id"), i) * 0.12).cast("float"))
    spark.range(n * mult)
      .select(col("id").as("vec_id"), emb.as("embedding"),
        label.cast("int").as("label"))
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft-sf1")
    val mult = args.lift(1).map(_.toInt).getOrElse(10)
    val src = "/root/testdata/sf0.1"
    val done = new java.io.File(out, "_GENSCALE_DONE")
    if (done.exists()) { println(s"already generated: $out"); return }
    val spark = GraftSession.local(appName = "graft-genscale")
    spark.sparkContext.setLogLevel("ERROR")
    genDocuments(spark, src, mult).repartition(8)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
    genEvents(spark, src, mult).repartition(8)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/events.parquet")
    genEmbeddings(spark, src, mult).repartition(8)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")
    for (t <- Tables.names if !Set("events", "documents", "embeddings").contains(t)) {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$src/$t.parquet"),
        java.nio.file.Paths.get(s"$out/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    spark.stop()
    java.nio.file.Files.write(done.toPath, Array.emptyByteArray)
    println(s"generated $out at ${mult}x sf0.1")
  }
}
