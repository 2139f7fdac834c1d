package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Build-once, read-back store for derived index artifacts (PQ code
  * tables, trained codebooks): materializes the build plan to parquet
  * under a content key and serves every later call from the files.
  *
  * Why files and not cached/checkpointed blocks: an index that lives as
  * executor storage blocks silently rebuilds (or dies) when blocks are
  * evicted under memory pressure — observed as ann_pq timing 0.4 s warm
  * locally but 7.97 s in the round-4 driver bench. A parquet table is the
  * real 100 TB shape anyway: the encoded corpus is an index TABLE, built
  * once per corpus snapshot, scanned by every search, surviving executor
  * loss and JVM restarts. Eviction can't touch it and a fresh session
  * pays only a footer read.
  *
  * Keys must encode every input that changes the artifact: source CONTENT
  * (via [[fingerprint]] — path alone is not enough, a regenerated corpus
  * at the same path must never serve a stale index) + builder version +
  * parameters. The key is split into a FAMILY (source dir + builder
  * version + user-chosen parameters) and the content-derived FINGERPRINT
  * (corpus fingerprint + any size-derived tuning like the √n stride):
  * when a new fingerprint of the same family commits, every older
  * generation of that family is deleted — the same orphan-generation GC
  * `Sinks.upsertCommitted` applies to table snapshots. Without it a
  * long-lived session over a regenerating corpus leaks disk without
  * bound (a single geo neighbor-graph artifact is 182 MB at sf10).
  */
object IndexStore {

  /** Cheap content fingerprint of a source file/directory: every data
    * file's (relative name, length, mtime) folded into one MD5. Reading
    * zero data bytes keeps it O(file count) — the same freshness contract
    * file-based build systems use, and exactly what a catalog snapshot id
    * (Delta/Iceberg version) would replace on a real lakehouse. Missing
    * paths fingerprint as "absent" rather than throwing: the build itself
    * owns that error.
    */
  def fingerprint(path: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().sortBy(_.getName).toSeq.flatMap(walk)
      else Seq(f)
    val base = new java.io.File(path)
    val md = java.security.MessageDigest.getInstance("MD5")
    if (!base.exists()) md.update("absent".getBytes("UTF-8"))
    else walk(base).foreach { f =>
      md.update(s"${f.getName}:${f.length}:${f.lastModified}\n".getBytes("UTF-8"))
    }
    md.digest().take(8).map("%02x".format(_)).mkString
  }
  private def root: java.io.File = new java.io.File(
    sys.env.getOrElse("GRAFT_INDEX_DIR",
      System.getProperty("java.io.tmpdir") + "/graft-index"))

  /** Sanitized, collision-safe directory name for an arbitrary key. */
  private def dirFor(key: String): java.io.File = {
    val safe = key.replaceAll("[^A-Za-z0-9._-]", "_").take(80)
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    new java.io.File(root, s"${safe}_$h")
  }

  /** Return the artifact for `family` at `fp`, building + writing it
    * first if no complete copy (_SUCCESS marker) exists. Synchronized:
    * one builder per JVM; concurrent readers after the marker appears
    * are safe.
    *
    * Retention: after a fresh build commits, sibling directories whose
    * `_FAMILY` marker names the same family (i.e. older fingerprints of
    * the same (dir, builder-version, params) artifact) are deleted —
    * their snapshot is gone, nothing can validly read them. The marker
    * is written AFTER the parquet commit, so a build that dies mid-write
    * leaves an unmarked dir that the next same-key build overwrites; and
    * a `_`-prefixed extra file is invisible to Spark's parquet reader.
    * GC only ever touches directories carrying a matching marker, never
    * the newly-committed one.
    */
  def materialize(s: SparkSession, family: String, fp: String)
                 (build: => DataFrame): DataFrame = {
    val key = s"${family}_$fp"
    val dir = dirFor(key)
    this.synchronized {
      if (!new java.io.File(dir, "_SUCCESS").exists()) {
        build.write.mode(SaveMode.Overwrite).parquet(dir.getAbsolutePath)
        java.nio.file.Files.write(new java.io.File(dir, "_FAMILY").toPath,
          family.getBytes("UTF-8"))
        gcOldGenerations(family, keep = dir)
      }
    }
    s.read.parquet(dir.getAbsolutePath)
  }

  private def gcOldGenerations(family: String, keep: java.io.File): Unit =
    Option(root.listFiles()).getOrElse(Array.empty[java.io.File]).foreach { sib =>
      val marker = new java.io.File(sib, "_FAMILY")
      if (sib.isDirectory && sib.getName != keep.getName && marker.exists() &&
          new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8") == family) {
        deleteRecursively(sib)
      }
    }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      .foreach(deleteRecursively)
    f.delete(): Unit
  }
}
