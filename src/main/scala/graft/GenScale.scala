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

  // ------------------------------------------------- TPC-H-side tables
  //
  // The corpus tables above were always generated at true scale; the
  // relational side was originally COPIED unchanged, which made sf0.1→sf1
  // ratios meaningless for the tpch_* family. These generators scale the
  // star schema the same way: fresh rows, observed value mixes and
  // ranges, every field a hash of the row id (deterministic, no RNG,
  // distributed via spark.range). Keys stay 0-based sequential like the
  // driver's generator; foreign keys hash-uniform into the scaled key
  // space, preserving join fan-in (~4 lines/order, ~10 orders/customer).
  // l_shipdate is uniform in its own window, matching the source data
  // (observed shiplag spans [-2399, +2496] days — NOT correlated), so
  // lateness/date predicates keep their selectivity.

  /** 2-decimal price uniform in [minCents, minCents+spanCents] / 100. */
  private def price(minCents: Long, spanCents: Long, tag: Int, id: Column): Column =
    round((lit(minCents) + h(spanCents + 1, tag, id)) / 100.0, 2)

  /** Day-granular timestamp uniform in [epochDay, epochDay+spanDays]. */
  private def day(epochDay: Long, spanDays: Long, tag: Int, id: Column): Column =
    timestamp_seconds((lit(epochDay) + h(spanDays + 1, tag, id)) * 86400L)

  private val D19950101 = 9131L  // epoch days
  private val D19950102 = 9132L

  def genOrders(spark: SparkSession, src: String, mult: Int): DataFrame = {
    val o = Tables.t(spark, src, "orders")
    val n = o.count()
    val nCust = Tables.t(spark, src, "customer").count() * mult
    val statuses = weightedValues(o, "o_orderstatus", 60)
    val prios = weightedValues(o, "o_orderpriority", 100)
    spark.range(n * mult)
      .select(col("id").as("o_orderkey"),
        h(nCust, 20, col("id")).as("o_custkey"),
        pick(statuses, 21, col("id")).as("o_orderstatus"),
        price(100191L, 49899127L, 22, col("id")).as("o_totalprice"),
        day(D19950101, 2404L, 23, col("id")).as("o_orderdate"),
        pick(prios, 24, col("id")).as("o_orderpriority"))
  }

  def genLineitem(spark: SparkSession, src: String, mult: Int): DataFrame = {
    val li = Tables.t(spark, src, "lineitem")
    val n = li.count()
    val nOrd = Tables.t(spark, src, "orders").count() * mult
    val nPart = Tables.t(spark, src, "part").count() * mult
    val nSupp = Tables.t(spark, src, "supplier").count() * mult
    val rflags = weightedValues(li, "l_returnflag", 60)
    val lstats = weightedValues(li, "l_linestatus", 40)
    spark.range(n * mult)
      .select(h(nOrd, 30, col("id")).as("l_orderkey"),
        h(nPart, 31, col("id")).as("l_partkey"),
        h(nSupp, 32, col("id")).as("l_suppkey"),
        (h(7, 33, col("id")) + 1).cast("int").as("l_linenumber"),
        (h(50, 34, col("id")) + 1).cast("double").as("l_quantity"),
        price(90068L, 10409923L, 35, col("id")).as("l_extendedprice"),
        (h(11, 36, col("id")) / 100.0).as("l_discount"),
        (h(9, 37, col("id")) / 100.0).as("l_tax"),
        pick(rflags, 38, col("id")).as("l_returnflag"),
        pick(lstats, 39, col("id")).as("l_linestatus"),
        day(D19950102, 2498L, 40, col("id")).as("l_shipdate"))
  }

  def genCustomer(spark: SparkSession, src: String, mult: Int): DataFrame = {
    val c = Tables.t(spark, src, "customer")
    val n = c.count()
    val segs = weightedValues(c, "c_mktsegment", 100)
    spark.range(n * mult)
      .select(col("id").as("c_custkey"),
        format_string("Customer#%09d", col("id")).as("c_name"),
        h(25, 50, col("id")).as("c_nationkey"),
        price(-99985L, 1099965L, 51, col("id")).as("c_acctbal"),
        pick(segs, 52, col("id")).as("c_mktsegment"))
  }

  def genPart(spark: SparkSession, src: String, mult: Int): DataFrame = {
    val p = Tables.t(spark, src, "part")
    val n = p.count()
    val adjs = weightedValues(
      p.select(split(col("p_name"), " ").getItem(0).as("adj")), "adj", 40)
    val nouns = weightedValues(
      p.select(split(col("p_name"), " ").getItem(1).as("noun")), "noun", 40)
    val types = weightedValues(p, "p_type", 60)
    spark.range(n * mult)
      .select(col("id").as("p_partkey"),
        concat(pick(adjs, 60, col("id")), lit(" "), pick(nouns, 61, col("id"))).as("p_name"),
        concat(lit("Brand#"), (h(25, 62, col("id")) + 1).cast("string")).as("p_brand"),
        pick(types, 63, col("id")).as("p_type"),
        (h(50, 64, col("id")) + 1).cast("int").as("p_size"),
        price(90000L, 9990L, 65, col("id")).as("p_retailprice"))
  }

  def genSupplier(spark: SparkSession, src: String, mult: Int): DataFrame = {
    val n = Tables.t(spark, src, "supplier").count()
    spark.range(n * mult)
      .select(col("id").as("s_suppkey"),
        format_string("Supplier#%09d", col("id")).as("s_name"),
        h(25, 70, col("id")).as("s_nationkey"),
        price(-97602L, 1096405L, 71, col("id")).as("s_acctbal"))
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft-sf1")
    val mult = args.lift(1).map(_.toInt).getOrElse(10)
    val src = "/root/testdata/sf0.1"
    val done = new java.io.File(out, "_GENSCALE_DONE")
    val doneTpch = new java.io.File(out, "_GENSCALE_TPCH_DONE")
    if (done.exists() && doneTpch.exists()) { println(s"already generated: $out"); return }
    val spark = GraftSession.local(appName = "graft-genscale")
    spark.sparkContext.setLogLevel("ERROR")
    if (!done.exists()) {
      genDocuments(spark, src, mult).repartition(8)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
      genEvents(spark, src, mult).repartition(8)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/events.parquet")
      genEmbeddings(spark, src, mult).repartition(8)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")
      java.nio.file.Files.write(done.toPath, Array.emptyByteArray)
    }
    if (!doneTpch.exists()) {
      genOrders(spark, src, mult).repartition(8)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/orders.parquet")
      genLineitem(spark, src, mult).repartition(16)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/lineitem.parquet")
      genCustomer(spark, src, mult).repartition(4)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/customer.parquet")
      genPart(spark, src, mult).repartition(4)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/part.parquet")
      genSupplier(spark, src, mult).repartition(2)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/supplier.parquet")
      for (t <- Seq("region", "nation")) {
        val dst = java.nio.file.Paths.get(s"$out/$t.parquet")
        if (!java.nio.file.Files.exists(dst))
          java.nio.file.Files.copy(java.nio.file.Paths.get(s"$src/$t.parquet"), dst)
      }
      java.nio.file.Files.write(doneTpch.toPath, Array.emptyByteArray)
    }
    spark.stop()
    println(s"generated $out at ${mult}x sf0.1")
  }
}
