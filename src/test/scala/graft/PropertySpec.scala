package graft

import graft.functions.{EvmCodec, Keccak}
import graft.hypermap.{Decode, EntriesFold, Fixtures, Layout, Schemas}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5.4): codec round trips, ABI
  * encode/decode inverse, fold determinism under permutation, layout
  * round-trip fidelity.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** ScalaCheck runner (the scalatestplus bridge isn't in the offline
    * cache; this is its essential behavior).
    */
  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(50), p)
    assert(res.passed, res.status.toString)
  }

  private val hexGen: Gen[String] =
    Gen.listOf(Gen.hexChar.map(_.toLower)).map(_.mkString)
      .suchThat(_.length % 2 == 0).map("0x" + _)

  test("hex round trip: hexToBytes . bytesToHex = identity") {
    check(Prop.forAll(hexGen) { h =>
      val b = Keccak.hexToBytes(h)
      b != null && ("0x" + Keccak.bytesToHex(b)) == h.toLowerCase
    })
  }

  test("uint256 dec/hex round trip") {
    check(Prop.forAll(Gen.chooseNum(0L, Long.MaxValue)) { n =>
      val dec = java.math.BigInteger.valueOf(n).toString
      val hex = EvmCodec.uintDecToBytes32(dec)
      hex.length == 66 && EvmCodec.topicToUintDec(hex) == dec
    })
  }

  test("checksum address is case-insensitive in input, stable in output") {
    val addrGen = Gen.listOfN(40, Gen.hexChar).map(_.mkString)
    check(Prop.forAll(addrGen) { a =>
      val c1 = EvmCodec.checksumAddress("0x" + a.toLowerCase)
      val c2 = EvmCodec.checksumAddress("0x" + a.toUpperCase)
      c1 == c2 && c1.toLowerCase == "0x" + a.toLowerCase
    })
  }

  test("ABI encode/decode inverse for arbitrary byte args") {
    val bytesGen = Gen.listOf(Gen.chooseNum(0, 255).map(_.toByte)).map(_.toArray)
    check(Prop.forAll(bytesGen, bytesGen) { (a, b) =>
      val data = Fixtures.encodeBytesArgs(Seq(a, b))
      val outA = EvmCodec.abiBytesArg(data, 0, 2)
      val outB = EvmCodec.abiBytesArg(data, 1, 2)
      outA == "0x" + Keccak.bytesToHex(a) && outB == "0x" + Keccak.bytesToHex(b)
    })
  }

  test("utf8Strict accepts all valid UTF-8, rejects lone continuation bytes") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val hex = "0x" + Keccak.bytesToHex(s.getBytes("UTF-8"))
      EvmCodec.utf8Strict(hex) == s
    })
    assert(EvmCodec.utf8Strict("0x80") == null)
    assert(EvmCodec.utf8Strict("0xc3") == null) // truncated 2-byte seq
    assert(EvmCodec.utf8Strict("0xc3a9") == "é")
  }

  test("fold determinism under arbitrary permutations (multiple seeds)") {
    val logs = Fixtures.goldenLogs
    val base = EntriesFold.fold(Decode.decode(Fixtures.toDF(spark, logs)))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("children", sort_array(col("children")))
      .withColumn("notes", sort_array(map_entries(col("notes"))))
      .withColumn("facts", sort_array(map_entries(col("facts"))))
      .select(base.columns.sorted.map(col).toIndexedSeq: _*)
    val canonBase = canon(base).collect().toSet
    Seq(1, 42, 99).foreach { seed =>
      val shuffled = new scala.util.Random(seed).shuffle(logs)
      val folded = canon(EntriesFold.fold(Decode.decode(Fixtures.toDF(spark, shuffled))))
      assert(folded.collect().toSet == canonBase, s"fold differs for seed $seed")
    }
  }

  test("partitioned layout round-trips the events table and prunes") {
    val decoded = Decode.decode(Fixtures.toDF(spark, Fixtures.goldenLogs))
    val dir = java.nio.file.Files.createTempDirectory("graft-layout")
      .resolve("events").toString
    Layout.writeEvents(decoded, dir)
    val back = Layout.readEvents(spark, dir)
    assert(back.count() == 14)
    val cols = decoded.columns.sorted.map(col)
    assert(back.select(cols.toIndexedSeq: _*)
      .exceptAll(decoded.select(cols.toIndexedSeq: _*)).isEmpty)
    // partition pruning: a type filter must read only that type's dirs
    val plan = spark.read.parquet(dir).where(col("eventType") === "Mint")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || back.where(col("eventType") === "Mint").count() == 2)
  }

  test("rouge: identical candidate/reference pairs score P = R = F = 1") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rouge-prop").toString
    // pairs (2k, 2k+1) share the text verbatim; texts differ across pairs
    val docs = (0L until 20L).map(i =>
      (i, (0 to 5 + (i / 2).toInt).map(j => s"w${i / 2}_$j").mkString(" ")))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = operators.TextAnalysis.rouge(spark, dir)
      .select($"rouge_p", $"rouge_r", $"rouge_f")
      .as[(Double, Double, Double)].collect()
    assert(out.length == 10)
    assert(out.forall(_ == ((1.0, 1.0, 1.0))), s"got ${out.toList}")
  }

  test("quantileNorm: identically distributed sources are fixed points (norm = raw)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-qn-prop").toString
    // three sources with the SAME multiset of 32 values (skewed, with ties)
    val vals = (1L to 32L).map(v => v * v % 97)
    val docs = for { s <- Seq("a", "b", "c"); v <- vals } yield (s, v)
    docs.toDF("source", "n_chars").write.parquet(s"$dir/documents.parquet")
    val out = operators.Learn.quantileNorm(spark, dir)
      .select($"raw_mean", $"norm_mean").as[(Double, Double)].collect()
    assert(out.length == 3 * operators.Learn.QnormB)
    out.foreach { case (raw, norm) =>
      assert(raw == norm, s"identical sources must be fixed points: $raw vs $norm")
    }
  }
}
