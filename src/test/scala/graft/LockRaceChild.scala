package graft

/** Forked-JVM side of IndexStoreSpec's cross-process writer-lock race:
  * signals readiness, then races the parent JVM to materialize the SAME
  * (family, fingerprint) artifact. If [[IndexStore.withRootLock]] works,
  * exactly one of the two build closures ever runs (each appends a line
  * to `<flagDir>/builds.log`) and both JVMs read identical artifact
  * content. Runs under the test classpath (`java.class.path` of the
  * forked ScalaTest JVM), so it needs no packaging step.
  */
object LockRaceChild {
  def main(args: Array[String]): Unit = {
    val family = args(0)
    val fp = args(1)
    val flagDir = new java.io.File(args(2))
    val spark = GraftSession.local(cpus = "4", appName = "lockrace-child")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import java.nio.file.StandardOpenOption.{APPEND, CREATE}
    // Signal the parent BEFORE touching IndexStore: the parent's build
    // closure holds the root lock while it waits for this flag, so by
    // the time this JVM's materialize reaches the lock, the parent is
    // provably mid-build — a real write/write race, not a lucky miss.
    java.nio.file.Files.write(new java.io.File(flagDir, "child-started").toPath,
      "1".getBytes("UTF-8"))
    val df = IndexStore.materialize(spark, family, fp) {
      java.nio.file.Files.write(new java.io.File(flagDir, "builds.log").toPath,
        "child-built\n".getBytes("UTF-8"), CREATE, APPEND)
      Seq((2L, "child")).toDF("k", "who")
    }
    val rows = df.collect()
      .map(r => s"${r.getLong(0)}:${r.getString(1)}").sorted.mkString(",")
    java.nio.file.Files.write(new java.io.File(flagDir, "child-read").toPath,
      rows.getBytes("UTF-8"))
    spark.stop()
    sys.exit(0) // don't let a lingering non-daemon thread hang the fork
  }
}
