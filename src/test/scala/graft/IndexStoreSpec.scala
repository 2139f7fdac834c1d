package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IndexStore retention (r14 verdict item 2): artifacts are keyed
  * (family, fingerprint); when a new fingerprint of the SAME family
  * commits — a regenerated corpus at the same path — older generations
  * of that family are deleted, while other families and concurrent
  * readers of the new artifact are untouched. Without this the store
  * only ever grew: every corpus regeneration leaked the previous
  * snapshot's postings/codes/neighbor-graph parquet forever.
  */
class IndexStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val indexRoot = new java.io.File(
    System.getProperty("java.io.tmpdir") + "/graft-index")

  private def familyDirs(family: String): Seq[java.io.File] =
    Option(indexRoot.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq
      .filter { d =>
        val m = new java.io.File(d, "_FAMILY")
        d.isDirectory && m.exists() &&
          new String(java.nio.file.Files.readAllBytes(m.toPath), "UTF-8") == family
      }

  test("new fingerprint retires the old generation (reader-safe), a later " +
       "commit past the grace window deletes it, other families untouched") {
    val fam = s"spec_gc_family_${System.nanoTime()}"
    val other = s"spec_gc_other_${System.nanoTime()}"

    val gen1 = IndexStore.materialize(spark, fam, "fp_aaaa")(
      Seq((1L, "one"), (2L, "two")).toDF("k", "v"))
    assert(gen1.count() == 2)
    val bystander = IndexStore.materialize(spark, other, "fp_aaaa")(
      Seq((9L, "nine")).toDF("k", "v"))
    assert(bystander.count() == 1)
    assert(familyDirs(fam).size == 1)
    val oldDir = familyDirs(fam).head

    // "Corpus regenerated": same family, new fingerprint, while gen1 (a
    // DataFrame whose file listing was resolved BEFORE the rebuild) is
    // still live — the exact mid-scan-delete scenario the r15 advisory
    // called out. The first GC pass must only RETIRE the old generation.
    val gen2 = IndexStore.materialize(spark, fam, "fp_bbbb")(
      Seq((1L, "uno"), (2L, "dos"), (3L, "tres")).toDF("k", "v"))
    assert(gen2.count() == 3)

    assert(oldDir.exists(), "old generation must survive the grace window")
    assert(new java.io.File(oldDir, "_RETIRED").exists(), "tombstone missing")
    assert(gen1.count() == 2, "reader holding the old generation must still scan it")
    assert(familyDirs(other).size == 1, "unrelated family must not be GC'd")

    // Fingerprint recurrence during grace: serving fp_aaaa again clears
    // the tombstone (snapshot-restored corpus must not lose its index).
    IndexStore.materialize(spark, fam, "fp_aaaa")(
      sys.error("must not rebuild: _SUCCESS exists")).count()
    assert(!new java.io.File(oldDir, "_RETIRED").exists(), "reactivation failed")

    // concurrent reader of the new artifact unaffected by the GC pass
    assert(gen2.where($"k" === 3L).select($"v").as[String].head() == "tres")

    // Re-retire, expire the grace window, and commit a third generation:
    // now the tombstoned dir must actually be deleted.
    IndexStore.materialize(spark, fam, "fp_bbbb")(sys.error("no rebuild")).count()
    val graceKey = "graft.index.gc.graceMs"
    val saved = sys.props.get(graceKey)
    try {
      sys.props(graceKey) = "600000"
      IndexStore.materialize(spark, fam, "fp_cccc")(
        Seq((7L, "sept")).toDF("k", "v")).count()
      assert(new java.io.File(oldDir, "_RETIRED").exists(), "re-retire failed")
      sys.props(graceKey) = "0"
      IndexStore.materialize(spark, fam, "fp_dddd")(
        Seq((8L, "huit")).toDF("k", "v")).count()
      assert(!oldDir.exists(), s"expired generation survived: $oldDir")
    } finally {
      saved match { case Some(v) => sys.props(graceKey) = v
                    case None => sys.props.remove(graceKey): Unit }
    }
    assert(familyDirs(other).size == 1, "unrelated family must not be GC'd")

    familyDirs(fam).foreach(d => deleteRec(d))
    familyDirs(other).foreach(d => deleteRec(d))
  }

  test("interrupted delete can never leave a committed-looking dir: " +
       "_SUCCESS is removed before data files") {
    // Simulate the partial-delete-then-fingerprint-recurrence hazard
    // (r15 advisory): materialize, retire+expire via a same-family
    // commit, and verify that after GC nothing under the old path
    // carries _SUCCESS without its data (here: the dir is fully gone;
    // the ordering guarantee is asserted structurally on the survivors).
    val fam = s"spec_gc_order_${System.nanoTime()}"
    val gen1 = IndexStore.materialize(spark, fam, "fp_1111")(
      Seq((1L, "a")).toDF("k", "v"))
    assert(gen1.count() == 1)
    val oldDir = familyDirs(fam).head
    val graceKey = "graft.index.gc.graceMs"
    val saved = sys.props.get(graceKey)
    try {
      sys.props(graceKey) = "0"
      IndexStore.materialize(spark, fam, "fp_2222")(
        Seq((2L, "b")).toDF("k", "v")).count() // retire
      IndexStore.materialize(spark, fam, "fp_3333")(
        Seq((3L, "c")).toDF("k", "v")).count() // delete (grace=0)
      assert(!new java.io.File(oldDir, "_SUCCESS").exists(),
        "_SUCCESS must never outlive the data files")
    } finally {
      saved match { case Some(v) => sys.props(graceKey) = v
                    case None => sys.props.remove(graceKey): Unit }
    }
    familyDirs(fam).foreach(d => deleteRec(d))
  }

  test("materializeBucketed: scan is bucketed (no exchange needed on the " +
       "artifact side), and a fresh catalog re-registers metadata-only") {
    val fam = s"spec_bucketed_${System.nanoTime()}"
    def build = Seq.tabulate(64)(i => (i.toLong, s"v$i")).toDF("k", "v")
    val art = IndexStore.materializeBucketed(spark, fam, "fp_b1", 4, "k")(build)
    assert(art.count() == 64)
    val probe = Seq((3L, "x"), (7L, "y")).toDF("k", "p")
    def planOf(df: org.apache.spark.sql.DataFrame): String = {
      df.queryExecution.toRdd.count() // AQE-final
      df.queryExecution.executedPlan.toString
    }
    val plan1 = planOf(art.join(probe.hint("shuffle_hash"), Seq("k")))
    assert(plan1.contains("Bucketed: true"),
      s"bucketed scan not used:\n$plan1")
    assert(plan1.contains("SelectedBucketsCount: 4 out of 4"), plan1)

    // A fresh session's catalog does not have the table: serving the
    // committed files must re-register it with the same bucket spec,
    // not rebuild, and keep the bucketed-scan property.
    val table = spark.catalog.listTables().collect()
      .map(_.name).find(_.startsWith("graft_idx_spec_bucketed_"))
      .getOrElse(fail("bucketed artifact table not in catalog"))
    spark.sql(s"DROP TABLE $table")
    val again = IndexStore.materializeBucketed(spark, fam, "fp_b1", 4, "k")(
      sys.error("must not rebuild: _SUCCESS exists"))
    assert(again.count() == 64)
    val plan2 = planOf(again.join(probe.hint("shuffle_hash"), Seq("k")))
    assert(plan2.contains("Bucketed: true"),
      s"re-registered table lost its bucket spec:\n$plan2")

    spark.sql(s"DROP TABLE IF EXISTS $table")
    familyDirs(fam).foreach(d => deleteRec(d))
  }

  test("a dir without _FAMILY marker (pre-GC era / crashed build) is never touched") {
    val fam = s"spec_gc_unmarked_${System.nanoTime()}"
    val legacy = new java.io.File(indexRoot, s"legacy_${System.nanoTime()}")
    assert(legacy.mkdirs())
    java.nio.file.Files.write(new java.io.File(legacy, "part-0.bin").toPath,
      Array[Byte](1, 2, 3))
    try {
      IndexStore.materialize(spark, fam, "fp_x")(Seq((1L, "a")).toDF("k", "v")).count()
      assert(legacy.exists(), "unmarked sibling must survive GC")
    } finally {
      deleteRec(legacy)
      familyDirs(fam).foreach(d => deleteRec(d))
    }
  }

  test("fingerprint survives a symlink cycle and fingerprints an " +
       "unreadable/missing path as absent, never NPEs") {
    // r16 verdict nit: `walk` called listFiles() unguarded — an
    // unreadable subdirectory NPE'd the fingerprint and thus the query.
    val base = java.nio.file.Files.createTempDirectory("graft-fp-spec").toFile
    try {
      java.nio.file.Files.write(new java.io.File(base, "a.parquet").toPath,
        Array[Byte](1, 2, 3))
      val sub = new java.io.File(base, "sub"); assert(sub.mkdirs())
      java.nio.file.Files.write(new java.io.File(sub, "b.parquet").toPath,
        Array[Byte](4, 5))
      val clean = IndexStore.fingerprint(base.getAbsolutePath)
      assert(clean.nonEmpty)
      // symlink cycle: sub/loop -> base. The old walk recursed forever
      // (or stack-overflowed); the canonical-path visited set terminates.
      java.nio.file.Files.createSymbolicLink(
        new java.io.File(sub, "loop").toPath, base.toPath)
      val cycled = IndexStore.fingerprint(base.getAbsolutePath)
      assert(cycled.nonEmpty, "cycle walk must terminate with a fingerprint")
      // missing path: "absent", not an exception (the build owns the error)
      assert(IndexStore.fingerprint(base.getAbsolutePath + "/nope").nonEmpty)
    } finally deleteRec(base)
  }

  test("materializeBucketed fails loudly on a bucket-spec mismatch and " +
       "backfills the marker for pre-marker artifacts") {
    val fam = s"spec_bspec_${System.nanoTime()}"
    def build = Seq.tabulate(16)(i => (i.toLong, s"v$i")).toDF("k", "v")
    val art = IndexStore.materializeBucketed(spark, fam, "fp_s1", 4, "k")(build)
    assert(art.count() == 16)
    val dir = familyDirs(fam).head
    val spec = new java.io.File(dir, "_BUCKETSPEC")
    assert(spec.exists(), "_BUCKETSPEC marker not written at commit")
    assert(new String(java.nio.file.Files.readAllBytes(spec.toPath), "UTF-8") == "4:k")

    // A re-registration with a different spec must throw, never silently
    // declare wrong bucket metadata over the committed files (r16 ADVICE
    // medium: bucket pruning would then return WRONG results, not error).
    val exN = intercept[IllegalArgumentException] {
      IndexStore.materializeBucketed(spark, fam, "fp_s1", 8, "k")(
        sys.error("must not rebuild"))
    }
    assert(exN.getMessage.contains("bucket-spec mismatch"), exN.getMessage)
    val exC = intercept[IllegalArgumentException] {
      IndexStore.materializeBucketed(spark, fam, "fp_s1", 4, "v")(
        sys.error("must not rebuild"))
    }
    assert(exC.getMessage.contains("bucket-spec mismatch"), exC.getMessage)

    // pre-marker artifact (r15/r16 builds): marker absent → backfilled
    // from the caller's spec once, then enforced
    assert(spec.delete())
    assert(IndexStore.materializeBucketed(spark, fam, "fp_s1", 4, "k")(
      sys.error("must not rebuild")).count() == 16)
    assert(spec.exists(), "legacy artifact did not get its marker backfilled")
    assert(new String(java.nio.file.Files.readAllBytes(spec.toPath), "UTF-8") == "4:k")

    // The backfill TRUSTS the caller (the documented invariant at the
    // materializeBucketed call sites, r17 verdict item 7): a deliberate
    // MISMATCH against a marker-less dir persists the wrong spec — and
    // the guard then catches it on the NEXT serve with the true spec,
    // the earliest the trust model can detect the typo.
    assert(spec.delete())
    assert(IndexStore.materializeBucketed(spark, fam, "fp_s1", 8, "k")(
      sys.error("must not rebuild")).count() == 16)
    assert(new String(java.nio.file.Files.readAllBytes(spec.toPath), "UTF-8") == "8:k",
      "marker-less dir must backfill the caller's spec (even a wrong one)")
    val exB = intercept[IllegalArgumentException] {
      IndexStore.materializeBucketed(spark, fam, "fp_s1", 4, "k")(
        sys.error("must not rebuild"))
    }
    assert(exB.getMessage.contains("bucket-spec mismatch"), exB.getMessage)

    val table = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("graft_idx_spec_bspec_"))
    table.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    familyDirs(fam).foreach(d => deleteRec(d))
  }

  test("family naming guard: a second _v<digits>_ segment is rejected at " +
       "materialize time (mis-parse would corrupt version retirement)") {
    // r17 advice: VersionedFamily is non-greedy, so supersession keys on
    // the FIRST _v<d>_ segment — a base or param carrying its own would
    // mis-parse the (base, version, params) triple and could tombstone a
    // live artifact. The guard makes the violation loud at write time.
    val bad = s"spec_v1_base_v2_params_${System.nanoTime()}"
    val ex = intercept[IllegalArgumentException] {
      IndexStore.materialize(spark, bad, "fp_x")(Seq((1L, "x")).toDF("k", "v"))
    }
    assert(ex.getMessage.contains("_v<digits>_"), ex.getMessage)
    // the single-segment convention (every real call site) still works
    val ok = s"spec_base_v2_params_${System.nanoTime()}"
    assert(IndexStore.materialize(spark, ok, "fp_x")(
      Seq((1L, "x")).toDF("k", "v")).count() == 1)
    familyDirs(ok).foreach(d => deleteRec(d))
  }

  test("a nested build (materialize inside a build closure) re-enters the " +
       "root lock instead of throwing OverlappingFileLockException") {
    // r16 ADVICE: FileChannel.lock() is JVM-wide non-reentrant; before
    // the depth counter, a build closure calling back into IndexStore
    // blew up with OverlappingFileLockException.
    val outer = s"spec_reent_outer_${System.nanoTime()}"
    val inner = s"spec_reent_inner_${System.nanoTime()}"
    val df = IndexStore.materialize(spark, outer, "fp_r1") {
      val dep = IndexStore.materialize(spark, inner, "fp_r1")(
        Seq((1L, "dep")).toDF("k", "v"))
      dep.select($"k", concat(lit("outer-"), $"v").as("v"))
    }
    assert(df.as[(Long, String)].collect().toSeq == Seq((1L, "outer-dep")))
    // both artifacts committed, each independently servable
    assert(IndexStore.materialize(spark, inner, "fp_r1")(
      sys.error("must not rebuild")).count() == 1)
    familyDirs(outer).foreach(d => deleteRec(d))
    familyDirs(inner).foreach(d => deleteRec(d))
  }

  test("retireSupersededVersions: tombstone, survive the grace window, " +
       "then delete; latest version and other params untouched") {
    val stamp = System.nanoTime()
    val base = s"spec_rsv_${stamp}_v"
    // v1 and v2 of the same (base, params); v1 of a DIFFERENT params
    // string (not superseded by v2_px — params differ)
    IndexStore.materialize(spark, s"${base}1_px", "fp_a")(
      Seq((1L, "a")).toDF("k", "v")).count()
    IndexStore.materialize(spark, s"${base}2_px", "fp_a")(
      Seq((2L, "b")).toDF("k", "v")).count()
    IndexStore.materialize(spark, s"${base}1_py", "fp_a")(
      Seq((3L, "c")).toDF("k", "v")).count()
    // an UNCOMMITTED higher version (half-written build: _FAMILY but no
    // _SUCCESS) must not count as supersession evidence
    val fake = new java.io.File(indexRoot, s"spec_rsv_fake_$stamp")
    assert(fake.mkdirs())
    java.nio.file.Files.write(new java.io.File(fake, "_FAMILY").toPath,
      s"${base}3_py".getBytes("UTF-8"))

    val v1px = familyDirs(s"${base}1_px").head
    val graceKey = "graft.index.gc.graceMs"
    val saved = sys.props.get(graceKey)
    try {
      sys.props(graceKey) = "600000"
      IndexStore.retireSupersededVersions(): Unit
      assert(v1px.exists(), "superseded version must survive the grace window")
      assert(new java.io.File(v1px, "_RETIRED").exists(), "tombstone missing")
      assert(familyDirs(s"${base}2_px").nonEmpty, "latest version swept")
      assert(familyDirs(s"${base}1_py").forall(d =>
        !new java.io.File(d, "_RETIRED").exists()),
        "v3_py is uncommitted — v1_py must not be considered superseded")
      sys.props(graceKey) = "0"
      assert(IndexStore.retireSupersededVersions() >= 1)
      assert(!v1px.exists(), "expired superseded version survived")
      assert(familyDirs(s"${base}2_px").nonEmpty)
      assert(familyDirs(s"${base}1_py").nonEmpty)
    } finally {
      saved match { case Some(v) => sys.props(graceKey) = v
                    case None => sys.props.remove(graceKey): Unit }
      deleteRec(fake)
      Seq(s"${base}1_px", s"${base}2_px", s"${base}1_py")
        .foreach(f => familyDirs(f).foreach(deleteRec))
    }
  }

  test("cross-process writer lock: two JVMs racing the same (family, fp) " +
       "run exactly one build and read identical artifacts") {
    // r16 verdict item 5: withRootLock was only ever exercised intra-JVM.
    // Fork a second JVM on the test classpath (LockRaceChild); the parent
    // build closure holds the root lock until the child is provably up
    // and contending, so the child's materialize must BLOCK on the OS
    // file lock, then find _SUCCESS and serve without rebuilding.
    val fam = s"spec_lockrace_${System.nanoTime()}"
    val flagDir = java.nio.file.Files.createTempDirectory("graft-lockrace").toFile
    val buildsLog = new java.io.File(flagDir, "builds.log")
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"),
      "graft.LockRaceChild", fam, "fp_race", flagDir.getAbsolutePath))
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(new java.io.File(flagDir, "child.log"))
    val proc = pb.start()
    def childLog: String = {
      val f = new java.io.File(flagDir, "child.log")
      if (f.exists()) new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        .takeRight(2000) else "<no child.log>"
    }
    try {
      import java.nio.file.StandardOpenOption.{APPEND, CREATE}
      val parent = IndexStore.materialize(spark, fam, "fp_race") {
        // hold the build (and the root lock) until the child JVM is past
        // session startup and about to contend
        val deadline = System.currentTimeMillis() + 120000
        while (!new java.io.File(flagDir, "child-started").exists() &&
               System.currentTimeMillis() < deadline) Thread.sleep(100)
        assert(new java.io.File(flagDir, "child-started").exists(),
          s"child never signalled startup; log:\n$childLog")
        Thread.sleep(1500) // let the child reach and block on the lock
        java.nio.file.Files.write(buildsLog.toPath,
          "parent-built\n".getBytes("UTF-8"), CREATE, APPEND)
        Seq((1L, "parent")).toDF("k", "who")
      }
      val parentRows = parent.collect()
        .map(r => s"${r.getLong(0)}:${r.getString(1)}").sorted.mkString(",")
      assert(proc.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
        s"child JVM did not exit; log:\n$childLog")
      assert(proc.exitValue() == 0, s"child failed; log:\n$childLog")
      val builds = new String(
        java.nio.file.Files.readAllBytes(buildsLog.toPath), "UTF-8")
        .split("\n").filter(_.nonEmpty).toSeq
      assert(builds == Seq("parent-built"),
        s"expected exactly one build (parent's), got $builds; log:\n$childLog")
      val childRead = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(flagDir, "child-read").toPath), "UTF-8")
      assert(childRead == parentRows && parentRows == "1:parent",
        s"divergent reads: parent=$parentRows child=$childRead")
    } finally {
      proc.destroyForcibly(): Unit
      familyDirs(fam).foreach(deleteRec)
      deleteRec(flagDir)
    }
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      .foreach(deleteRec)
    f.delete(): Unit
  }
}
