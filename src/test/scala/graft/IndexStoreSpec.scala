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

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      .foreach(deleteRec)
    f.delete(): Unit
  }
}
