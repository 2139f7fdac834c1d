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

  test("new fingerprint of a family GCs the old generation, leaves other families") {
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

    // "Corpus regenerated": same family, new fingerprint. Hold a reader
    // on the NEW artifact across the GC and read it again after.
    val gen2 = IndexStore.materialize(spark, fam, "fp_bbbb")(
      Seq((1L, "uno"), (2L, "dos"), (3L, "tres")).toDF("k", "v"))
    assert(gen2.count() == 3)

    assert(!oldDir.exists(), s"stale generation survived: $oldDir")
    assert(familyDirs(fam).size == 1, "exactly the new generation remains")
    assert(familyDirs(other).size == 1, "unrelated family must not be GC'd")

    // concurrent reader of the new artifact unaffected by the GC pass
    assert(gen2.where($"k" === 3L).select($"v").as[String].head() == "tres")

    // idempotent re-materialize serves the files, no rebuild, no delete
    val again = IndexStore.materialize(spark, fam, "fp_bbbb")(
      sys.error("must not rebuild: _SUCCESS exists"))
    assert(again.count() == 3)

    familyDirs(fam).foreach(d => deleteRec(d))
    familyDirs(other).foreach(d => deleteRec(d))
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
