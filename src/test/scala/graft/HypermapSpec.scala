package graft

import graft.functions.EvmCodec
import graft.hypermap.{Decode, EntriesFold, Fixtures, Schemas}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Golden-output + semantics tests for the hypermap decode and entries fold
  * (SURVEY.md §5 — the reference's only stated correctness contract plus the
  * unit fixtures from FIXTURES.md §5).
  */
class HypermapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val goldenRaw = Fixtures.toDF(spark, Fixtures.goldenLogs ++ Fixtures.adversarialLogs)
  lazy val decoded = Decode.decode(goldenRaw).cache()

  test("golden range decodes to exactly 14 events: 8 Note, 4 Transfer, 2 Mint") {
    val counts = decoded.groupBy($"eventType").count()
      .as[(String, Long)].collect().toMap
    assert(counts == Map("Note" -> 8L, "Transfer" -> 4L, "Mint" -> 2L))
    assert(decoded.count() == 14) // all 5 adversarial logs silently skipped
  }

  test("decoded fields match ethers semantics") {
    val mint = decoded.where($"eventType" === "Mint" && $"label" === "os")
      .head()
    assert(mint.getAs[String]("parenthash") == Schemas.RootHash)
    assert(mint.getAs[String]("childhash") == Fixtures.OsHash)
    // indexed dynamic bytes topic = keccak(label), stored verbatim
    assert(mint.getAs[String]("labelhash") == EvmCodec.keccakUtf8("os"))

    val xfer = decoded.where($"eventType" === "Transfer" && $"id" === "12345").head()
    // addresses come out EIP-55 checksummed (ethers getAddress)
    assert(xfer.getAs[String]("from") == EvmCodec.checksumAddress("0x" + "11" * 20))
    assert(xfer.getAs[String]("to") == EvmCodec.checksumAddress("0x" + "22" * 20))

    val note = decoded.where($"eventType" === "Note" && $"label" === "~ip" &&
      $"blockNumber" === 27431000L && $"logIndex" === 0).head()
    assert(note.getAs[String]("data") == "0x" + graft.functions.Keccak.bytesToHex(
      "10.0.0.1".getBytes("UTF-8")))
    assert(note.getAs[String]("event_id").endsWith("_0"))
  }

  test("blocks dimension left join yields nullable timestamps") {
    val blocks = Seq((27430010L, 1740000000L), (27430500L, 1740000600L))
      .toDF("blockNumber", "timestamp")
    val withTs = Decode.decode(goldenRaw, Some(blocks))
    val ts = withTs.where($"eventType" === "Mint")
      .select($"blockNumber", $"timestamp").as[(Long, Option[Long])]
      .collect().toMap
    assert(ts(27430010L).contains(1740000000L))
    val missing = withTs.where($"timestamp".isNull).count()
    assert(missing == 12) // all non-Mint blocks absent from the dim
  }

  // ------------------------------------------------------------- fold

  lazy val entries = EntriesFold.fold(decoded).cache()

  test("fold: alice entry has LWW notes, os has children") {
    val alice = entries.where($"label" === "alice").head()
    val notes = alice.getAs[Map[String, String]]("notes")
    // ~ip written twice; later (block 27431500) wins
    assert(notes("~ip") == "0x" + graft.functions.Keccak.bytesToHex("10.0.0.2".getBytes("UTF-8")))
    assert(notes.keySet == Set("~ip", "~port", "~bio", "~avatar", "~website"))
    assert(alice.getAs[Long]("creationBlock") == 27430500L)

    val os = entries.where($"namehash" === Fixtures.OsHash).head()
    assert(os.getAs[Seq[String]]("children").toSet ==
      Set(EvmCodec.namehash(Fixtures.OsHash, "alice")))
    assert(os.getAs[Map[String, String]]("notes").keySet == Set("~net-key", "~routers"))
  }

  test("fold: faithful mode never sets owner (decimal id vs hex namehash quirk)") {
    assert(entries.where($"owner".isNotNull).count() == 0)
  }

  test("fold: normalized mode resolves Transfer owners") {
    val norm = EntriesFold.fold(decoded, normalizeTransferIds = true)
    val alice = norm.where($"label" === "alice").head()
    // last Transfer of alice's id (block 27433500) set owner to addr2
    assert(alice.getAs[String]("owner") == EvmCodec.checksumAddress("0x" + "22" * 20))
    // os transferred at 27430800 — AFTER its Mint at 27430010 → applied
    val os = norm.where($"namehash" === Fixtures.OsHash).head()
    assert(os.getAs[String]("owner") == EvmCodec.checksumAddress("0x" + "11" * 20))
    // id 12345 matches no entry → no extra rows
    assert(norm.count() == entries.count())
  }

  test("fold: placeholder parent for mints under unknown parents") {
    // a Mint whose parent was never minted → parent entry with label [unknown]
    val orphanParent = EvmCodec.namehash(Schemas.RootHash, "never-minted")
    val logs = Seq(Fixtures.mint(orphanParent, "orphan", 100L, 0))
    val e = EntriesFold.fold(Decode.decode(Fixtures.toDF(spark, logs)))
    val parent = e.where($"namehash" === orphanParent).head()
    assert(parent.getAs[String]("label") == "[unknown]")
    assert(parent.getAs[String]("parentHash") == Schemas.RootHash)
    assert(parent.getAs[Seq[String]]("children").toSet ==
      Set(EvmCodec.namehash(orphanParent, "orphan")))
    // placeholder creation keeps [unknown] even if minted LATER
    val logs2 = logs :+ Fixtures.mint(Schemas.RootHash, "never-minted", 200L, 0)
    val e2 = EntriesFold.fold(Decode.decode(Fixtures.toDF(spark, logs2)))
    val p2 = e2.where($"namehash" === orphanParent).head()
    assert(p2.getAs[String]("label") == "[unknown]") // $setOnInsert skipped
    assert(p2.getAs[Long]("creationBlock") == 100L)
    assert(p2.getAs[Long]("lastUpdateBlock") == 200L) // later Mint still bumps
  }

  test("fold: Fact/Note before entry creation are dropped") {
    val h = EvmCodec.namehash(Schemas.RootHash, "late")
    val logs = Seq(
      Fixtures.note(h, "~early", "x".getBytes("UTF-8"), 50L, 0), // before Mint
      Fixtures.mint(Schemas.RootHash, "late", 100L, 0),
      Fixtures.note(h, "~after", "y".getBytes("UTF-8"), 150L, 0))
    val e = EntriesFold.fold(Decode.decode(Fixtures.toDF(spark, logs)))
    val notes = e.where($"namehash" === h).head().getAs[Map[String, String]]("notes")
    assert(notes.keySet == Set("~after")) // ~early dropped (unknown entry)
  }

  test("fold: permutation determinism — shuffled input yields identical entries") {
    val logs = Fixtures.goldenLogs ++ Fixtures.adversarialLogs
    val shuffled = new Random(7).shuffle(logs)
    val a = EntriesFold.fold(Decode.decode(Fixtures.toDF(spark, logs)))
    val b = EntriesFold.fold(Decode.decode(Fixtures.toDF(spark, shuffled)))
    val cols = a.columns.sorted.map(col)
    // children arrays are sets — sort for comparison
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("children", sort_array($"children"))
      // set ops reject MapType — compare maps as sorted entry arrays
      .withColumn("notes", sort_array(map_entries($"notes")))
      .withColumn("facts", sort_array(map_entries($"facts")))
      .select(cols.toIndexedSeq: _*)
    assert(canon(a).exceptAll(canon(b)).isEmpty && canon(b).exceptAll(canon(a)).isEmpty)
  }

  test("fold: gene applies only to existing entries (updateOne, no upsert)") {
    val h = EvmCodec.namehash(Schemas.RootHash, "g")
    val addr = "0x" + "ab" * 20
    val logs = Seq(
      Fixtures.gene(h, addr, 50L, 0), // before Mint → silent no-op
      Fixtures.mint(Schemas.RootHash, "g", 100L, 0),
      Fixtures.gene(h, addr, 150L, 0), // after Mint → applied
      Fixtures.gene(h, "0x" + "cd" * 20, 200L, 0)) // last writer wins
    val e = EntriesFold.fold(Decode.decode(Fixtures.toDF(spark, logs)))
    val row = e.where($"namehash" === h).head()
    assert(row.getAs[String]("gene") == EvmCodec.checksumAddress("0x" + "cd" * 20))
    assert(row.getAs[Long]("lastUpdateBlock") == 200L)
    // entry for a never-minted gene target must not exist
    val e2 = EntriesFold.fold(Decode.decode(Fixtures.toDF(spark,
      Seq(Fixtures.gene(EvmCodec.namehash(Schemas.RootHash, "ghost"), addr, 10L, 0)))))
    assert(e2.count() == 0)
  }

  test("incremental entries equals full rebuild after each batch") {
    val all = Fixtures.goldenLogs
    val batches = Seq(all.take(5), all.slice(5, 10), all.drop(10))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("children", sort_array($"children"))
      .withColumn("notes", sort_array(map_entries($"notes")))
      .withColumn("facts", sort_array(map_entries($"facts")))
      .select(df.columns.sorted.map(col).toIndexedSeq: _*)
    var history = Seq.empty[Fixtures.Log]
    var entriesState = EntriesFold.fold(
      Decode.decode(Fixtures.toDF(spark, Seq.empty)))
    batches.foreach { b =>
      history = history ++ b
      val allEvents = Decode.decode(Fixtures.toDF(spark, history))
      val newBatch = Decode.decode(Fixtures.toDF(spark, b))
      entriesState = EntriesFold.incrementalEntries(allEvents, entriesState, newBatch)
      val full = EntriesFold.fold(allEvents)
      assert(canon(entriesState).exceptAll(canon(full)).isEmpty &&
        canon(full).exceptAll(canon(entriesState)).isEmpty,
        s"incremental diverges from rebuild after batch of ${b.size}")
    }
  }

  test("fullName resolution walks parent chain") {
    val resolved = EntriesFold.resolveFullNames(entries, maxDepth = 4)
    val alice = resolved.where($"label" === "alice").head()
    assert(alice.getAs[String]("fullName") == "alice.os")
  }
}
