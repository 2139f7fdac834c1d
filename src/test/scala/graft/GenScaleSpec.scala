package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sf1 generator must be deterministic (hash-derived, no RNG state)
  * and distribution-faithful — otherwise the sf0.1→sf1 ratios PERF.md
  * records compare different workloads, not different scales.
  */
class GenScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val src = "/root/testdata/sf0.1"

  test("generation is deterministic across runs") {
    val a = GenScale.genDocuments(spark, src, 1).orderBy($"doc_id").limit(50).collect().toSeq
    val b = GenScale.genDocuments(spark, src, 1).orderBy($"doc_id").limit(50).collect().toSeq
    assert(a == b)
    val e1 = GenScale.genEvents(spark, src, 1).orderBy($"event_id").limit(50).collect().toSeq
    val e2 = GenScale.genEvents(spark, src, 1).orderBy($"event_id").limit(50).collect().toSeq
    assert(e1 == e2)
  }

  test("generated documents keep the source's vocabulary and length envelope") {
    val gen = GenScale.genDocuments(spark, src, 1)
    assert(gen.count() == Tables.documents(spark, src).count())
    val srcVocab = Tables.documents(spark, src)
      .select(explode(split($"text", " ")).as("t")).distinct()
      .as[String].collect().toSet
    val genVocab = gen.select(explode(split($"text", " ")).as("t")).distinct()
      .as[String].collect().toSet
    assert(genVocab.subsetOf(srcVocab),
      s"generator invented tokens: ${(genVocab -- srcVocab).take(5)}")
    val (lo, hi) = gen
      .select(min(size(split($"text", " "))), max(size(split($"text", " "))))
      .as[(Int, Int)].head()
    assert(lo >= 10 && hi <= 100, s"doc length envelope broke: [$lo, $hi]")
    // n_chars is derived, not drawn
    assert(gen.where(length($"text") =!= $"n_chars").count() == 0)
  }

  test("generated events scale the user range with mult and keep the type mix") {
    val g2 = GenScale.genEvents(spark, src, 2)
    assert(g2.count() == Tables.events(spark, src).count() * 2)
    val users = g2.agg(max($"user_id")).as[Long].head()
    assert(users < 3000L, s"user range should be 1500*mult, saw max $users")
    val mix = g2.groupBy($"event_type").count().as[(String, Long)].collect().toMap
    assert(mix.keySet ==
      Set("click", "view", "purchase", "signup", "error"))
    val (lo, hi) = (mix.values.min, mix.values.max)
    assert(hi < lo * 2, s"type mix should stay ~uniform like the source: $mix")
  }

  test("generated embeddings carry dim-64 vectors clustered by label") {
    val g = GenScale.genEmbeddings(spark, src, 1)
    assert(g.where(size($"embedding") =!= 64).count() == 0)
    assert(g.select($"label").distinct().count() == 10)
    // cluster structure: same-label vectors sit nearer their label-mates
    // than a cross-label baseline (cheap proxy: per-label component means
    // differ across labels while within-label variance stays bounded)
    val comp0 = g.select($"label", element_at($"embedding", 1).cast("double").as("c"))
      .groupBy($"label").agg(avg($"c").as("m"), stddev($"c").as("s"))
      .as[(Long, Double, Double)].collect().toSeq
    val spread = comp0.map(_._2).max - comp0.map(_._2).min
    assert(spread > 0.05, s"label centroids indistinguishable: spread=$spread")
    assert(comp0.forall(_._3 < 0.2), "within-label noise exceeds design (0.12 scale)")
  }
}
