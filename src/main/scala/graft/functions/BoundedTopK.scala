package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Bounded per-key k-smallest aggregation: `min_k_pairs(score, id, k)`
  * keeps the k lexicographically smallest (score, id) pairs per group in
  * a size-capped buffer.
  *
  * Why an aggregate and not a window: `row_number() OVER (PARTITION BY
  * probe ORDER BY score)` must SHUFFLE every candidate row to its
  * probe's partition before it can rank — on an output-quadratic
  * candidate set (geo_radius_join's pair list grows ~n² with density,
  * PERF.md's 11×/decade row) the shuffle itself is the scale-killer even
  * when the final output is capped. A TypedImperativeAggregate gets
  * MAP-SIDE PARTIAL aggregation: each input partition reduces its slice
  * of a probe's candidates to ≤k pairs before the exchange, so shuffled
  * bytes are O(k · probes · map-partitions) no matter how dense the
  * candidate set — the same partial-combine shape that makes `max()`
  * scale, applied to top-k. This is the exact trick sketches use
  * (TopKSketchAgg above); here the "sketch" is lossless because k-of-k
  * merge is exact.
  *
  * Determinism: pairs order by (score, then id) — equal scores (a radius
  * join's rounded distances collide) break ties on the id, so the
  * result is a pure function of the input set, never of partitioning.
  */
class MinKPairs(val k: Int) extends Serializable {
  // Fixed parallel primitive arrays kept sorted by (score, id), not a
  // TreeSet: the partial-aggregation hash map holds ONE buffer PER
  // GROUP KEY LIVE AT ONCE (thousands of probes per scan partition), so
  // per-buffer footprint is the scaling term — two primitive arrays are
  // ~10× smaller than k boxed tuples in a red-black tree, and at k ≤ a
  // few hundred the memmove insert beats tree rebalancing anyway.
  private[functions] val scores = new Array[Double](k)
  private[functions] val ids = new Array[Long](k)
  private[functions] var n = 0
  @inline private def ltAt(i: Int, s: Double, id: Long): Boolean =
    scores(i) < s || (scores(i) == s && ids(i) < id)
  @inline private def gtAt(i: Int, s: Double, id: Long): Boolean =
    scores(i) > s || (scores(i) == s && ids(i) > id)
  def add(score: Double, id: Long): Unit = {
    // full buffer and current max <= new pair ⇒ can't place (an exact
    // dup of the max is correctly rejected here too)
    if (n == k && !gtAt(k - 1, score, id)) return
    // binary search for the insertion point in (score, id) order
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ltAt(mid, score, id)) lo = mid + 1 else hi = mid
    }
    // SET semantics: an exact (score, id) duplicate is one candidate,
    // not two ranks (a replayed row must not occupy two slots)
    if (lo < n && scores(lo) == score && ids(lo) == id) return
    val last = if (n < k) n else k - 1
    var j = last
    while (j > lo) { scores(j) = scores(j - 1); ids(j) = ids(j - 1); j -= 1 }
    scores(lo) = score; ids(lo) = id
    if (n < k) n += 1
  }
  def merge(other: MinKPairs): Unit = {
    var i = 0
    while (i < other.n) { add(other.scores(i), other.ids(i)); i += 1 }
  }
  /** Ascending (score, id) view — tests and eval. */
  def pairs: Seq[(Double, Long)] = (0 until n).map(i => (scores(i), ids(i)))
}

/** array<struct<d double, id long>> of the k smallest (score, id) pairs,
  * ascending — positions are the ranks (posexplode + 1 downstream).
  */
case class MinKPairsAgg(score: Expression, id: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MinKPairs] {
  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))))

  override def createAggregationBuffer(): MinKPairs = new MinKPairs(k)

  override def update(buf: MinKPairs, input: InternalRow): MinKPairs = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: MinKPairs, other: MinKPairs): MinKPairs = {
    buf.merge(other); buf
  }

  override def eval(buf: MinKPairs): Any =
    new GenericArrayData(
      buf.pairs.toSeq.map { case (s, i) => InternalRow(s, i) }.toArray[Any])

  override def serialize(buf: MinKPairs): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.pairs.size)
    buf.pairs.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MinKPairs = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new MinKPairs(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.add(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MinKPairsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinKPairsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): MinKPairsAgg =
    copy(score = cs(0), id = cs(1))
}

object topk {
  /** min_k_pairs(score, id, k): the k smallest (score, id) pairs per
    * group, ascending, with map-side partial reduction to ≤k.
    */
  def min_k_pairs(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      MinKPairsAgg(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
