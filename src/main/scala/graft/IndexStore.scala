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
  * parameters. The store never invalidates; a changed fingerprint simply
  * keys a fresh build and the old artifact ages out with its snapshot.
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

  /** Return the artifact for `key`, building + writing it first if no
    * complete copy (_SUCCESS marker) exists. Synchronized: one builder
    * per JVM; concurrent readers after the marker appears are safe.
    */
  def materialize(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val dir = dirFor(key)
    this.synchronized {
      if (!new java.io.File(dir, "_SUCCESS").exists()) {
        build.write.mode(SaveMode.Overwrite).parquet(dir.getAbsolutePath)
      }
    }
    s.read.parquet(dir.getAbsolutePath)
  }
}
