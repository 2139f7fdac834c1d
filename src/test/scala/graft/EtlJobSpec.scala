package graft

import graft.hypermap.{Decode, EntriesFold, EtlJob, Fixtures}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** End-to-end CLI batch job (§3.1): raw JSON logs → decode → idempotent
  * sink → entries rebuild → report, including the dry-run and block-range
  * modes and idempotent re-run.
  */
class EtlJobSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def writeRaw(): (String, String) = {
    val base = Files.createTempDirectory("graft-etl")
    val rawDir = base.resolve("raw").toString
    Fixtures.toDF(spark, Fixtures.goldenLogs ++ Fixtures.adversarialLogs)
      .coalesce(1).write.json(rawDir)
    (rawDir, base.resolve("out").toString)
  }

  test("batch job lands events + entries and reports reference counts") {
    val (rawDir, outDir) = writeRaw()
    val report = EtlJob.run(spark, rawDir, outDir)
    assert(report.scanned == 19)  // 14 golden + 5 adversarial
    assert(report.decoded == 14)  // junk silently skipped (T1/E9)
    assert(report.inserted == 14)
    assert(report.byType == Map("Note" -> 8L, "Transfer" -> 4L, "Mint" -> 2L))
    assert(spark.read.parquet(s"$outDir/events").count() == 14)
    // entries table ≡ a direct fold of the decoded golden logs
    val entries = spark.read.parquet(s"$outDir/entries")
    val expected = EntriesFold.fold(Decode.decode(Fixtures.toDF(spark, Fixtures.goldenLogs)))
    assert(entries.select("namehash").as[String].collect().sorted.toSeq ==
      expected.select("namehash").as[String].collect().sorted.toSeq)

    // idempotent re-run: nothing new inserted, tables unchanged
    val again = EtlJob.run(spark, rawDir, outDir)
    assert(again.inserted == 0)
    assert(spark.read.parquet(s"$outDir/events").count() == 14)
  }

  test("dry run (--print) decodes and reports but writes nothing") {
    val (rawDir, outDir) = writeRaw()
    val report = EtlJob.run(spark, rawDir, outDir, printOnly = true)
    assert(report.decoded == 14 && report.inserted == 0)
    assert(!new java.io.File(outDir).exists())
  }

  test("block range bounds the scan like the reference's --from/--to") {
    val (rawDir, outDir) = writeRaw()
    val report = EtlJob.run(spark, rawDir, outDir,
      fromBlock = Some(27431000L), toBlock = Some(27432000L))
    // golden logs in [27431000, 27432000]: 4 notes + 1 transfer
    assert(report.decoded == 5)
    assert(report.byType == Map("Note" -> 4L, "Transfer" -> 1L))
  }
}
