package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-19 optimization internals.
  *
  * BlockJanitor is the round's leak fix: iterative finals and fan-out
  * pins RETURN eagerly checkpointed frames their operators cannot free;
  * Bench sweeps them between sequential runs. The contract pinned here:
  *  1. sweep unpersists an unprotected localCheckpoint's blocks;
  *  2. SessionCache artifacts are protected — a sweep must never free
  *     them, INCLUDING when the cached frame is a projection over its
  *     checkpoint (the common artifact shape) rather than a root
  *     LogicalRDD;
  *  3. a swept gate rebuilt afterwards computes the same result (the
  *     sweep can only ever free storage, never change semantics).
  */
class R19OptSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rddOf(ds: org.apache.spark.sql.Dataset[_]) =
    org.apache.spark.sql.graftbridge.CheckpointBridge.checkpointedRdd(ds)

  test("sweep frees an unprotected localCheckpoint; protect exempts") {
    val leaked = (1 to 100).toDF("x").localCheckpoint()
    val kept = (1 to 100).toDF("y").localCheckpoint()
    BlockJanitor.protect(kept)
    val leakedRdd = rddOf(leaked).get
    val keptRdd = rddOf(kept).get
    assert(spark.sparkContext.getPersistentRDDs.contains(leakedRdd.id))
    BlockJanitor.sweep(spark)
    // unpersist(blocking=false) removes the persistentRdds entry
    // synchronously; only block deletion is async
    assert(!spark.sparkContext.getPersistentRDDs.contains(leakedRdd.id),
      "sweep left an unprotected localCheckpoint registered")
    assert(spark.sparkContext.getPersistentRDDs.contains(keptRdd.id),
      "sweep freed a protected artifact")
    assert(kept.count() == 100)
    rddOf(kept).foreach(_.unpersist(blocking = false))
  }

  test("protect covers checkpoints UNDER a derived plan, not just roots") {
    val cache = new SessionCache[String]("r19_spec_cache")
    // artifact shape: Project ∘ Filter over the checkpoint — exactly how
    // lshLabels/dailyIdx hand out their memoized frames
    val art = cache.getOrCompute(spark, "k") {
      (1 to 50).toDF("x").localCheckpoint()
        .where(col("x") > 10).select((col("x") * 2).as("y"))
    }
    BlockJanitor.sweep(spark)
    assert(art.count() == 40,
      "sweep freed the checkpoint under a SessionCache-derived frame")
  }

  test("a swept gate rebuilt afterwards is unchanged (gr_pagerank)") {
    val sf = "/root/testdata/sf0.001"
    val fn = SparkEntry.queries("gr_pagerank")
    val before = fn(spark, sf).collect().toSeq
    BlockJanitor.sweep(spark)
    val after = fn(spark, sf).collect().toSeq
    assert(before == after)
    BlockJanitor.sweep(spark)
  }

  test("artifact ledger records SessionCache build seconds by family") {
    val cache = new SessionCache[String]("r19_spec_ledger")
    cache.getOrCompute(spark, "k")((1 to 10).toDF("x").localCheckpoint())
    val snap = ArtifactLedger.snapshot
    assert(snap.contains("r19_spec_ledger") && snap("r19_spec_ledger") >= 0.0)
  }
}
