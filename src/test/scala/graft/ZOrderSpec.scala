package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Measures the thing the Z-order layout exists for: how many FILES a
  * two-dimensional box predicate must touch, via each file's parquet-style
  * min/max envelope, comparing a single-column-sorted layout against the
  * z-clustered one.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"
  val NFiles = 16

  test("zvalue interleaves bits (known vectors)") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (255L, 0L), (0L, 255L), (170L, 85L))
      .toDF("x", "y")
      .select(ZOrder.zvalue($"x", $"y").cast("long")).as[Long].collect().toSeq
    // interleave(x,y) with x in even bits, y in odd bits:
    // x=10101010 -> bits {2,6,10,14}; y=01010101 -> bits {1,5,9,13} -> 0x6666
    assert(rows == Seq(0L, 1L, 2L, 3L, 0x5555L, 0xAAAAL, 0x6666L))
  }

  test("one z-layout prunes files on BOTH dims; a single-dim sort fails the other dim") {
    val events = Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"event_type", $"value")
    val tmp = Files.createTempDirectory("zorder").toString

    // normalize both dims into [0, 256) (locality-preserving bucketing:
    // user_id 0..14 spreads by *17, event_id 0..999 shrinks by /4)
    val bucketed = events
      .withColumn("xb", ($"user_id" * 17).bitwiseAND(255))
      .withColumn("yb", shiftright($"event_id", 2).bitwiseAND(255))

    // layout A: classic single-column sort (user leads)
    bucketed.repartitionByRange(NFiles, $"xb")
      .sortWithinPartitions($"xb", $"yb")
      .write.mode("overwrite").parquet(s"$tmp/by_user")
    // layout B: z-order on (user bucket, event bucket)
    ZOrder.writeZOrdered(bucketed, "xb", "yb", s"$tmp/by_z", NFiles)

    // a file must be read iff its [min,max] envelope overlaps the predicate
    // box — exactly the parquet row-group/file stats pruning rule
    def filesTouched(path: String,
                     x: (Int, Int) = (0, 255), y: (Int, Int) = (0, 255)): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min($"xb").as("x0"), max($"xb").as("x1"),
          min($"yb").as("y0"), max($"yb").as("y1"))
        .where($"x1" >= x._1 && $"x0" <= x._2 && $"y1" >= y._1 && $"y0" <= y._2)
        .count()

    val total = spark.read.parquet(s"$tmp/by_z")
      .select(input_file_name()).distinct().count()
    assert(total > NFiles / 2, s"expected ~$NFiles files, got $total")

    // user-range query: both layouts prune (user leads layout A; even bits in B)
    val aX = filesTouched(s"$tmp/by_user", x = (64, 95))
    val zX = filesTouched(s"$tmp/by_z", x = (64, 95))
    // event-range query: layout A has NO pruning power (every file spans
    // all events for its users); z keeps event ranges tight per file too
    val aY = filesTouched(s"$tmp/by_user", y = (64, 95))
    val zY = filesTouched(s"$tmp/by_z", y = (64, 95))

    // (not exactly == total: a file holding one sparse user can miss the
    // slab by luck, but there is no systematic 2nd-dim pruning)
    assert(aY >= total * 8 / 10,
      s"single-dim layout unexpectedly pruned the 2nd dim: $aY/$total")
    assert(zY < aY, s"z-order should beat single-dim sort on dim 2: z=$zY vs $aY")
    assert(zX <= total / 2 && zY <= total / 2,
      s"z-order should prune both dims: x=$zX, y=$zY of $total")
    assert(aX <= total / 2, s"sanity: leading-dim pruning works in layout A: $aX")
  }
}
