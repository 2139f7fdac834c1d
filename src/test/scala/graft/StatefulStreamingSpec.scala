package graft

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{ClosedSession, Ev}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** flatMapGroupsWithState sessionization and watermarked windowed
  * aggregation semantics over MemoryStream micro-batches.
  */
class StatefulStreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("stateful sessionization closes sessions on gaps, state survives batches") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StatefulOps.sessionize(input.toDS(), gap = 10L)
      .writeStream.outputMode("append").format("memory")
      .queryName("closed_sessions").start()
    try {
      // batch 1: two sessions' worth for key 1 (gap 25 > 10 closes the first)
      input.addData(Ev(1L, 1L), Ev(1L, 5L), Ev(1L, 30L), Ev(2L, 100L))
      q.processAllAvailable()
      val after1 = spark.table("closed_sessions").as[ClosedSession].collect().toSet
      assert(after1 == Set(ClosedSession(1L, 1L, 5L, 2L)))

      // batch 2: key 1's open session [30] continues at 35, then closes at 60;
      // key 2's open session closes too. Cross-batch state did the carrying.
      input.addData(Ev(1L, 35L), Ev(1L, 60L), Ev(2L, 200L))
      q.processAllAvailable()
      val after2 = spark.table("closed_sessions").as[ClosedSession].collect().toSet
      assert(after2 == Set(
        ClosedSession(1L, 1L, 5L, 2L),
        ClosedSession(1L, 30L, 35L, 2L),
        ClosedSession(2L, 100L, 100L, 1L)))
    } finally q.stop()
  }

  test("dedupWithinWatermark drops redelivered ids, then evicts expired state") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val df = input.toDF().toDF("ts", "event_id")
    val q = StatefulOps.dedupWithinWatermark(df, "ts", "30 seconds", Seq("event_id"))
      .writeStream.outputMode("append").format("memory")
      .queryName("deduped").start()
    try {
      input.addData((t("2026-01-01 00:00:05"), 1L), (t("2026-01-01 00:00:10"), 2L))
      q.processAllAvailable()
      // same batch ids pass through once
      assert(spark.table("deduped").count() == 2)

      // batch 2 redelivers id 1 within the watermark horizon → dropped;
      // id 3 is new → emitted
      input.addData((t("2026-01-01 00:00:12"), 1L), (t("2026-01-01 00:00:20"), 3L))
      q.processAllAvailable()
      val ids2 = spark.table("deduped").as[(Timestamp, Long)].collect().map(_._2).toSeq
      assert(ids2.sorted == Seq(1L, 2L, 3L))

      // advance the watermark far past the ids' expiry, then redeliver id 1:
      // its dedup state was evicted, so it re-emits — the documented bounded-
      // state trade (redelivery beyond the horizon is the sink's job again)
      input.addData((t("2026-01-01 00:10:00"), 99L))
      q.processAllAvailable()
      input.addData((t("2026-01-01 00:10:05"), 1L))
      q.processAllAvailable()
      val ids4 = spark.table("deduped").as[(Timestamp, Long)].collect().map(_._2).toSeq
      assert(ids4.count(_ == 1L) == 2 && ids4.length == 5)
    } finally q.stop()
  }

  test("streaming SCD2 fold: closed versions across batches equal the batch fold") {
    import StatefulOps.{AttrEv, ClosedVersion}
    implicit val sql = spark.sqlContext
    val events = Seq(
      // key 1: a a b b a — three versions; the a→b flip straddles batches
      AttrEv(1L, 10L, "a"), AttrEv(1L, 11L, "a"), AttrEv(1L, 12L, "b"),
      AttrEv(1L, 13L, "b"), AttrEv(1L, 14L, "a"),
      // key 2: x only — never closes, stays in state
      AttrEv(2L, 5L, "x"), AttrEv(2L, 6L, "x"))
    val (b1, b2) = events.splitAt(3)
    val input = MemoryStream[AttrEv]
    val q = StatefulOps.scd2Fold(input.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("scd2_closed").start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("scd2_closed").as[ClosedVersion].collect().toSet
    assert(streamed == Set(
      ClosedVersion(1L, 1L, "a", 10L, 12L, 2L),
      ClosedVersion(1L, 2L, "b", 12L, 14L, 2L)))
    // batch twin on the same rows: its non-current versions are exactly
    // the streamed closed set (same versions, bounds, and counts)
    val batch = graft.operators.Temporal.scd2History(
        events.toDF("k", "t", "attr").select($"k", $"t", $"attr"), "k", "attr", "t")
      .where($"is_current" === 0L)
      .select($"k", $"version", $"attr", $"valid_from", $"valid_to", $"n_events")
      .as[(Long, Long, String, Long, Long, Long)].collect().toSet
    assert(batch == streamed.map(c =>
      (c.key, c.version, c.attr, c.validFrom, c.validTo, c.n)))
  }

  test("streaming dedup→LSH→incremental CC equals one-shot batch clustering " +
       "(2-batch replay with redelivery overlap)") {
    implicit val sql = spark.sqlContext
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .where($"doc_id" < 200).select($"doc_id", $"text")
    val all = docs.as[(Long, String)].collect().toSeq
    val b1 = all.take(110)
    val b2 = all.drop(100) // 10 docs redelivered across the batch boundary
    val input = MemoryStream[(Long, String)]
    @volatile var st = graft.streaming.IncrementalClusters.empty(spark)
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        st = graft.streaming.IncrementalClusters.foldBatch(st, b); ()
      }
      .start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val inc = st.labels.as[(Long, Long)].collect().toMap
    val oneShot = graft.operators.Graph.connectedComponentsStar(
        graft.operators.Dedup.lshCandidatePairs(docs))
      .as[(Long, Long)].collect().toMap
    assert(inc.nonEmpty, "no clusters formed — fixture makes the test vacuous")
    assert(inc == oneShot,
      s"streaming labels != batch labels: only-inc=${(inc.toSet -- oneShot.toSet).take(5)} " +
        s"only-batch=${(oneShot.toSet -- inc.toSet).take(5)}")
    // redelivered ids were absorbed: signature state is one row per doc
    assert(st.sigs.count() == all.size)
  }

  test("durable corpus state survives a restart: kill after batch 1, " +
       "restart with same checkpoint+state dirs, fold batch 2 ≡ one-shot batch") {
    import graft.streaming.IncrementalClusters
    val tmp = java.nio.file.Files.createTempDirectory("graft_durable").toFile
    val inDir = new java.io.File(tmp, "in"); inDir.mkdirs()
    val ckDir = new java.io.File(tmp, "ck").getPath
    val stDir = new java.io.File(tmp, "state").getPath
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .where($"doc_id" < 200).select($"doc_id", $"text")
    val all = docs.as[(Long, String)].collect().toSeq
    val b1 = all.take(110)
    val b2 = all.drop(110)
    def stream() = spark.readStream
      .schema("doc_id long, text string").json(inDir.getPath)

    // run 1: deliver batch 1, then "kill" (stop the query)
    b1.toDF("doc_id", "text").coalesce(1).write.mode("append").json(inDir.getPath)
    val (q1, _) = IncrementalClusters.startDurable(stream(), ckDir, stDir)
    try { q1.processAllAvailable() } finally q1.stop()

    // a fresh process sees the committed batch-1 state, not empty
    val recovered = IncrementalClusters.loadState(spark, stDir)
      .getOrElse(fail("no durable state committed after batch 1"))
    assert(recovered.sigs.count() == b1.size)

    // re-folding the delivered batch (the crash window between state
    // commit and offset commit) is a no-op against the recovered state
    val refold = IncrementalClusters.foldBatch(recovered, b1.toDF("doc_id", "text"))
    assert(refold.sigs.count() == b1.size)
    assert(refold.labels.as[(Long, Long)].collect().toMap ==
      recovered.labels.as[(Long, Long)].collect().toMap)

    // run 2 (the restart): same checkpoint dir → batch 1 is NOT redelivered,
    // so only durable state can make the final labels match the batch run
    b2.toDF("doc_id", "text").coalesce(1).write.mode("append").json(inDir.getPath)
    val (q2, state2) = IncrementalClusters.startDurable(stream(), ckDir, stDir)
    try { q2.processAllAvailable() } finally q2.stop()

    val inc = state2().labels.as[(Long, Long)].collect().toMap
    val oneShot = graft.operators.Graph.connectedComponentsStar(
        graft.operators.Dedup.lshCandidatePairs(docs))
      .as[(Long, Long)].collect().toMap
    assert(inc.nonEmpty, "no clusters formed — fixture makes the test vacuous")
    assert(inc == oneShot,
      s"post-restart labels != batch labels: only-inc=${(inc.toSet -- oneShot.toSet).take(5)} " +
        s"only-batch=${(oneShot.toSet -- inc.toSet).take(5)}")
    assert(state2().sigs.count() == all.size)
    // per-batch commits are sig DELTAS: two segments live (one per batch),
    // and only the committed version keeps a label snapshot
    val vdirs = new java.io.File(stDir).listFiles()
      .filter(_.getName.startsWith("v")).sortBy(_.getName)
    assert(vdirs.length == 2, s"expected 2 delta segments, got ${vdirs.map(_.getName).toSeq}")
    val withLabels = vdirs.filter(d => new java.io.File(d, "labels/_SUCCESS").exists())
    assert(withLabels.map(_.getName).toSeq == Seq(s"v${IncrementalClusters.committedVersion(stDir).get}"),
      "only the committed version should hold a label snapshot")
    // delta sizes: batch-sized, not corpus-sized (the O(batch) write claim)
    val seg0 = spark.read.parquet(new java.io.File(vdirs(0), "sigs").getPath).count()
    val seg1 = spark.read.parquet(new java.io.File(vdirs(1), "sigs").getPath).count()
    assert(seg0 == b1.size && seg1 == b2.size,
      s"segments should be per-batch deltas: $seg0/$seg1 vs ${b1.size}/${b2.size}")
  }

  test("durable corpus state compacts sig segments past maxSegs") {
    import graft.streaming.IncrementalClusters
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toFile
    val inDir = new java.io.File(tmp, "in"); inDir.mkdirs()
    val ckDir = new java.io.File(tmp, "ck").getPath
    val stDir = new java.io.File(tmp, "state").getPath
    val all = Tables.documents(spark, "/root/testdata/sf0.001")
      .where($"doc_id" < 120).select($"doc_id", $"text")
      .as[(Long, String)].collect().toSeq
    // three batches with maxSegs=2: the third commit must fold to one _FULL
    for (b <- all.grouped(40).toSeq) {
      b.toDF("doc_id", "text").coalesce(1).write.mode("append").json(inDir.getPath)
      val (q, _) = IncrementalClusters.startDurable(stream(inDir), ckDir, stDir,
        maxSegs = 2)
      try q.processAllAvailable() finally q.stop()
    }
    val segs = new java.io.File(stDir).listFiles()
      .filter(d => d.getName.startsWith("v") &&
        new java.io.File(d, "sigs/_SUCCESS").exists())
    assert(segs.length == 1, s"expected 1 compacted segment, got ${segs.map(_.getName).toSeq}")
    assert(new java.io.File(segs.head, "sigs/_FULL").exists(), "compacted segment not marked _FULL")
    val st = IncrementalClusters.loadState(spark, stDir).get
    assert(st.sigs.count() == all.size)
  }

  private def stream(inDir: java.io.File) =
    spark.readStream.schema("doc_id long, text string").json(inDir.getPath)

  test("durable commit crash BETWEEN segment write and manifest rename: " +
       "reader stays on the pre-crash commit; redelivery completes the version") {
    import graft.streaming.IncrementalClusters
    val stDir = java.nio.file.Files.createTempDirectory("graft_crash_a")
      .resolve("state").toString
    val all = Tables.documents(spark, "/root/testdata/sf0.001")
      .where($"doc_id" < 150).select($"doc_id", $"text")
      .as[(Long, String)].collect().toSeq
    val (b1, b2) = all.splitAt(100)
    val s1 = IncrementalClusters.foldBatch(
      IncrementalClusters.empty(spark), b1.toDF("doc_id", "text"))
    IncrementalClusters.persistState(s1, stDir, 0L)
    val labels0 = IncrementalClusters.loadState(spark, stDir).get
      .labels.as[(Long, Long)].collect().toMap
    val sigs0 = IncrementalClusters.loadState(spark, stDir).get
      .sigs.select($"doc_id").as[Long].collect().toSet

    val s2 = IncrementalClusters.foldBatch(
      IncrementalClusters.loadState(spark, stDir).get, b2.toDF("doc_id", "text"))
    val delta = s2.sigs.join(s1.sigs.select($"doc_id"), Seq("doc_id"), "left_anti")
    intercept[RuntimeException] {
      IncrementalClusters.persistVersionImpl(delta, s2.labels, stDir, 1L,
        fullSigs = false, crashBeforeManifest = true)
    }
    // the v1 segment is fully on disk but NOT committed: the manifest
    // still points at v0 and the loaded state is bit-for-bit the old one
    assert(IncrementalClusters.committedVersion(stDir).contains(0L))
    val rec = IncrementalClusters.loadState(spark, stDir).get
    assert(rec.sigs.select($"doc_id").as[Long].collect().toSet == sigs0)
    assert(rec.labels.as[(Long, Long)].collect().toMap == labels0)
    // the redelivered commit (same version, same bytes) finds the complete
    // segment, skips the rewrite, and just moves the manifest
    IncrementalClusters.persistVersionImpl(delta, s2.labels, stDir, 1L,
      fullSigs = false)
    assert(IncrementalClusters.committedVersion(stDir).contains(1L))
    val after = IncrementalClusters.loadState(spark, stDir).get
    assert(after.sigs.count() == all.size)
    assert(after.labels.as[(Long, Long)].collect().toMap ==
      s2.labels.as[(Long, Long)].collect().toMap)
  }

  test("durable commit crash BETWEEN manifest rename and GC: the committed " +
       "state reads exactly, stale segments are healed by dedup then swept") {
    import graft.streaming.IncrementalClusters
    val stDir = java.nio.file.Files.createTempDirectory("graft_crash_b")
      .resolve("state").toString
    val all = Tables.documents(spark, "/root/testdata/sf0.001")
      .where($"doc_id" < 180).select($"doc_id", $"text")
      .as[(Long, String)].collect().toSeq
    val (b1, rest) = all.splitAt(80)
    val (b2, b3) = rest.splitAt(60)
    val s1 = IncrementalClusters.foldBatch(
      IncrementalClusters.empty(spark), b1.toDF("doc_id", "text"))
    IncrementalClusters.persistState(s1, stDir, 0L)
    val s2 = IncrementalClusters.foldBatch(
      IncrementalClusters.loadState(spark, stDir).get, b2.toDF("doc_id", "text"))
    IncrementalClusters.persistVersionImpl(
      s2.sigs.join(s1.sigs.select($"doc_id"), Seq("doc_id"), "left_anti"),
      s2.labels, stDir, 1L, fullSigs = false)
    // compaction commit (full union at v2) crashes after the rename,
    // before GC: v0 (_FULL) and the v1 delta survive alongside v2
    intercept[RuntimeException] {
      IncrementalClusters.persistVersionImpl(s2.sigs, s2.labels, stDir, 2L,
        fullSigs = true, crashBeforeGc = true)
    }
    assert(IncrementalClusters.committedVersion(stDir).contains(2L))
    val live = new java.io.File(stDir).listFiles()
      .filter(_.getName.matches("v\\d+")).map(_.getName).toSet
    assert(live == Set("v0", "v1", "v2"),
      s"crash window should leave all segments on disk, got $live")
    // the reader heals the overlap by doc_id dedup: exactly the committed state
    val rec = IncrementalClusters.loadState(spark, stDir).get
    assert(rec.sigs.count() == b1.size + b2.size)
    assert(rec.labels.as[(Long, Long)].collect().toMap ==
      s2.labels.as[(Long, Long)].collect().toMap)
    // the NEXT commit's GC sweeps everything below the newest _FULL
    val s3 = IncrementalClusters.foldBatch(rec, b3.toDF("doc_id", "text"))
    IncrementalClusters.persistVersionImpl(
      s3.sigs.join(rec.sigs.select($"doc_id"), Seq("doc_id"), "left_anti"),
      s3.labels, stDir, 3L, fullSigs = false)
    val swept = new java.io.File(stDir).listFiles()
      .filter(_.getName.matches("v\\d+")).map(_.getName).toSet
    assert(swept == Set("v2", "v3"), s"stale pre-compaction segments not swept: $swept")
    assert(IncrementalClusters.loadState(spark, stDir).get.sigs.count() == all.size)
  }

  test("stream-stream interval join matches across batches within the bound") {
    implicit val sql = spark.sqlContext
    val imps = MemoryStream[(Timestamp, Long)]
    val clicks = MemoryStream[(Timestamp, Long)]
    val joined = StatefulOps.intervalJoin(
      imps.toDF().toDF("imp_ts", "ad_id"),
      clicks.toDF().toDF("click_ts", "c_ad_id"),
      "ad_id", "c_ad_id", "imp_ts", "click_ts",
      watermarkDelay = "30 seconds", within = "10 seconds")
    val q = joined.select("ad_id", "imp_ts", "click_ts")
      .writeStream.outputMode("append").format("memory")
      .queryName("attributed").start()
    try {
      // batch 1: impressions only — nothing to emit, ads wait in state
      imps.addData((t("2026-01-01 00:00:05"), 1L), (t("2026-01-01 00:00:05"), 2L))
      q.processAllAvailable()
      assert(spark.table("attributed").count() == 0)

      // batch 2: ad 1 clicked within 10 s (cross-batch match), ad 2
      // clicked 25 s later (outside the bound), ad 3 never shown
      clicks.addData((t("2026-01-01 00:00:12"), 1L),
        (t("2026-01-01 00:00:30"), 2L), (t("2026-01-01 00:00:14"), 3L))
      q.processAllAvailable()
      val out = spark.table("attributed")
        .as[(Long, Timestamp, Timestamp)].collect().toSet
      assert(out == Set((1L, t("2026-01-01 00:00:05"), t("2026-01-01 00:00:12"))))
    } finally q.stop()
  }

  test("native session_window merges gap-sessions and finalizes behind the watermark") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDF().toDF("ts", "user")
    val q = StatefulOps.sessionWindowCounts(df, "ts", "user",
        gap = "1 minute", watermarkDelay = "30 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_counts").start()
    try {
      // user a: two events 30 s apart (ONE session — gap < 1 min), then
      // a third 5 min later that opens a second session
      input.addData((t("2026-01-01 00:00:00"), "a"), (t("2026-01-01 00:00:30"), "a"))
      q.processAllAvailable()
      assert(spark.table("sess_counts").count() == 0) // still open

      input.addData((t("2026-01-01 00:05:00"), "a"))
      q.processAllAvailable() // watermark 00:04:30 > first session close 00:01:30
      val afterFirst = spark.table("sess_counts")
        .as[(String, Timestamp, Timestamp, Long)].collect().toSet
      assert(afterFirst == Set(("a", t("2026-01-01 00:00:00"), t("2026-01-01 00:01:30"), 2L)),
        s"first session should finalize merged with both events: $afterFirst")

      // advance the watermark far past the second session
      input.addData((t("2026-01-01 00:30:00"), "b"))
      input.addData((t("2026-01-01 01:00:00"), "b"))
      q.processAllAvailable()
      val all = spark.table("sess_counts")
        .as[(String, Timestamp, Timestamp, Long)].collect().toSet
      assert(all.contains(("a", t("2026-01-01 00:05:00"), t("2026-01-01 00:06:00"), 1L)),
        s"second session missing: $all")
    } finally q.stop()
    // batch equivalence: the same function over a static frame agrees
    // with the custom sessionizer's grouping at the same gap
    val batch = Seq(
      (t("2026-01-01 00:00:00"), "a"), (t("2026-01-01 00:00:30"), "a"),
      (t("2026-01-01 00:05:00"), "a"), (t("2026-01-01 00:30:00"), "b"),
    ).toDF("ts", "user")
    val sessions = StatefulOps.sessionWindowCounts(batch, "ts", "user",
        gap = "1 minute", watermarkDelay = "0 seconds")
      .as[(String, Timestamp, Timestamp, Long)].collect().toSet
    assert(sessions == Set(
      ("a", t("2026-01-01 00:00:00"), t("2026-01-01 00:01:30"), 2L),
      ("a", t("2026-01-01 00:05:00"), t("2026-01-01 00:06:00"), 1L),
      ("b", t("2026-01-01 00:30:00"), t("2026-01-01 00:31:00"), 1L)))
  }

  test("watermarked windowed counts finalize once the watermark passes") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDF().toDF("ts", "kind")
    val q = StatefulOps.windowedCounts(df, "ts", "kind", "1 minute", "30 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("win_counts").start()
    try {
      input.addData((t("2026-01-01 00:00:05"), "a"), (t("2026-01-01 00:00:40"), "a"),
        (t("2026-01-01 00:00:50"), "b"))
      q.processAllAvailable()
      // watermark (max 00:00:50 - 30s) hasn't passed the window end → nothing final
      assert(spark.table("win_counts").count() == 0)

      // an event far past the window advances the watermark → window [00:00,00:01) emits
      input.addData((t("2026-01-01 00:05:00"), "a"))
      q.processAllAvailable()
      val out = spark.table("win_counts")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(out == Set(
        (t("2026-01-01 00:00:00"), "a", 2L),
        (t("2026-01-01 00:00:00"), "b", 1L)))

      // a late row behind the watermark is dropped, not re-opened
      input.addData((t("2026-01-01 00:00:59"), "a"))
      q.processAllAvailable()
      assert(spark.table("win_counts").count() == 2)
    } finally q.stop()
  }
}
