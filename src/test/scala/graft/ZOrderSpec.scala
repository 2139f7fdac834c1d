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

  test("zvalueN generalizes: 3-dim interleave known vectors, 2-dim case unchanged") {
    val rows = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L), (255L, 0L, 0L))
      .toDF("x", "y", "z")
      .select(ZOrder.zvalueN(Seq($"x", $"y", $"z")).cast("long")).as[Long].collect().toSeq
    // bit i of dim k -> position 3i+k; x=255 -> bits {0,3,...,21} = (8^8-1)/7
    assert(rows == Seq(1L, 2L, 4L, (math.pow(8, 8).toLong - 1) / 7))
    val two = Seq((170L, 85L)).toDF("x", "y")
      .select(ZOrder.zvalueN(Seq($"x", $"y")).cast("long")).as[Long].head()
    assert(two == 0x6666L) // identical to the 2-dim zvalue vector above
  }

  test("hilbertIndex is a bijective curve: 64x64 corner = indices 0..4095, " +
       "consecutive indices are grid neighbors") {
    val grid = ZOrder.withHilbert(
        spark.range(64L * 64)
          .select(($"id" % 64).as("x"), expr("id DIV 64").as("y")),
        $"x", $"y", "h")
      .select($"x", $"y", $"h")
      .as[(Long, Long, Long)].collect().toSeq
    // the (0,0)-quadrant of each recursion level is visited first, so the
    // 64x64 corner of the 256x256 curve owns exactly indices 0..4095
    assert(grid.map(_._3).sorted == (0L until 4096L).toSeq,
      "hilbert indices of the corner subgrid are not a permutation of 0..4095")
    val byH = grid.sortBy(_._3)
    byH.sliding(2).foreach { case Seq((x0, y0, h0), (x1, y1, _)) =>
      val dist = math.abs(x1 - x0) + math.abs(y1 - y0)
      assert(dist == 1, s"curve jumps at h=$h0: ($x0,$y0)->($x1,$y1)")
    }
  }

  test("withHilbertN is a bijective unit-step curve over the FULL space (3 dims, 2 dims)") {
    // bits=4 → the whole 16³ cube: indices must be a permutation of
    // 0..4095 and consecutive indices must be grid neighbors — no
    // corner-subcube assumption needed, this is the entire domain
    val cube = ZOrder.withHilbertN(
        spark.range(16L * 16 * 16).select(
          ($"id" % 16).as("x"),
          (expr("id DIV 16") % 16).as("y"),
          expr("id DIV 256").as("z")),
        Seq($"x", $"y", $"z"), "h", bits = 4)
      .select($"x", $"y", $"z", $"h")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(cube.map(_._4).sorted == (0L until 4096L).toSeq,
      "3-dim hilbert is not a bijection onto 0..4095")
    cube.sortBy(_._4).sliding(2).foreach {
      case Seq((x0, y0, z0, h0), (x1, y1, z1, _)) =>
        val dist = math.abs(x1 - x0) + math.abs(y1 - y0) + math.abs(z1 - z0)
        assert(dist == 1, s"3-dim curve jumps at h=$h0: ($x0,$y0,$z0)->($x1,$y1,$z1)")
    }
    // 2-dim sanity on the same implementation (full 16x16 space)
    val sq = ZOrder.withHilbertN(
        spark.range(16L * 16).select(($"id" % 16).as("x"), expr("id DIV 16").as("y")),
        Seq($"x", $"y"), "h", bits = 4)
      .select($"x", $"y", $"h").as[(Long, Long, Long)].collect().toSeq
    assert(sq.map(_._3).sorted == (0L until 256L).toSeq)
    sq.sortBy(_._3).sliding(2).foreach { case Seq((x0, y0, h0), (x1, y1, _)) =>
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"2-dim skilling curve jumps at h=$h0")
    }
  }

  test("3-dim layouts prune every dimension; Hilbert stays at or under Morton") {
    val events = Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"value")
      .withColumn("xb", ($"user_id" * 17).bitwiseAND(255))
      .withColumn("yb", shiftright($"event_id", 2).bitwiseAND(255))
      .withColumn("zb", floor($"value").cast("long").bitwiseAND(255))
    val tmp = Files.createTempDirectory("zorder3").toString
    ZOrder.writeClustered(events,
      ZOrder.zvalueN(Seq($"xb", $"yb", $"zb")), s"$tmp/by_z3", NFiles)
    ZOrder.withHilbertN(events, Seq($"xb", $"yb", $"zb"), "__k")
      .repartitionByRange(NFiles, $"__k").sortWithinPartitions($"__k").drop("__k")
      .write.mode("overwrite").parquet(s"$tmp/by_h3")

    def touched(path: String, dim: String): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min(col(dim)).as("lo"), max(col(dim)).as("hi"))
        .where($"hi" >= 64 && $"lo" <= 95)
        .count()
    def total(path: String): Long =
      spark.read.parquet(path).select(input_file_name()).distinct().count()

    for (path <- Seq(s"$tmp/by_z3", s"$tmp/by_h3")) {
      val n = total(path)
      for (dim <- Seq("xb", "yb", "zb")) {
        val t = touched(path, dim)
        assert(t < n, s"$path: no pruning on $dim ($t of $n)")
      }
    }
    val z3 = Seq("xb", "yb", "zb").map(touched(s"$tmp/by_z3", _)).sum
    val h3 = Seq("xb", "yb", "zb").map(touched(s"$tmp/by_h3", _)).sum
    assert(h3 <= z3 + 3,
      s"3-dim hilbert materially worse than morton: hilbert=$h3 morton=$z3")
    info(s"3-dim files touched (sum over 3 slab queries): morton=$z3 hilbert=$h3 " +
      s"of ${total(s"$tmp/by_z3")} files")
  }

  test("fileSkip gate pins the three-layout pruning shape") {
    val rows = graft.operators.ZOrder.fileSkip(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (insN, insV, insU) = rows("insertion")
    val (_, valV, valU) = rows("value_sorted")
    val (_, zV, zU) = rows("zorder")
    assert(insN == 32)
    // insertion order prunes (almost) nothing on either predicate
    assert(insV >= 30 && insU >= 30, s"got $rows")
    // single-column sort: near-perfect on its column, blind on the other
    assert(valV <= 4 && valU == 32, s"got $rows")
    // z-order prunes MATERIALLY on both — strictly better than insertion
    // everywhere, and better than the value sort on the user dimension
    assert(zV < insV && zU < insU && zU < valU, s"got $rows")
    assert(zV <= 12 && zU <= 24, s"z pruning weaker than designed: $rows")
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

    // layout C: Hilbert on the same buckets — must also prune both dims;
    // its no-jump locality should keep it at or under Morton's touch count
    // on this box workload (PERF.md records the measured values)
    ZOrder.writeHilbertOrdered(bucketed, "xb", "yb", s"$tmp/by_h", NFiles)
    val hX = filesTouched(s"$tmp/by_h", x = (64, 95))
    val hY = filesTouched(s"$tmp/by_h", y = (64, 95))
    assert(hX <= total / 2 && hY <= total / 2,
      s"hilbert should prune both dims: x=$hX, y=$hY of $total")
    assert(hX + hY <= zX + zY + 2,
      s"hilbert materially worse than morton on the box workload: " +
        s"hilbert=($hX,$hY) morton=($zX,$zY)")
    info(s"files touched of $total: morton x=$zX y=$zY, hilbert x=$hX y=$hY, " +
      s"single-dim x=$aX y=$aY")
  }
}
