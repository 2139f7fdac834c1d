package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import scala.collection.mutable

/** SpaceSaving (Metwally et al.) heavy-hitters sketch.
  *
  * Bounded-memory top-k frequency estimation: capacity-m summary where
  * evicting the minimum counter inherits its count as the new item's
  * overestimate. Guarantees: every true item with frequency > N/m is
  * present; reported count ∈ [true, true + minEvicted].
  *
  * Mutable per-partition buffer, merged associatively — exactly the shape
  * `TypedImperativeAggregate` exists for. At 100 TB this replaces a full
  * token groupBy (shuffle of every distinct token) with a fixed-size
  * sketch per partition + one tiny merge.
  */
class SpaceSavingSketch(val capacity: Int) extends Serializable {
  // item -> (count, error). count includes error (overestimate bound).
  val counters: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty
  // Ordered index over (count, item): head is the deterministic eviction
  // victim (min count, ties to the smallest item), making add O(log m)
  // instead of an O(m) scan per eviction — the difference between a sketch
  // that keeps up with a 100 TB scan and one that melts when every add
  // evicts. Kept in lockstep with `counters` by put/remove below.
  private val order: mutable.TreeSet[(Long, String)] = mutable.TreeSet.empty

  private[functions] def put(item: String, count: Long, err: Long): Unit = {
    counters.get(item).foreach { case (c, _) => order.remove((c, item)) }
    counters.update(item, (count, err))
    order.add((count, item))
  }

  private def removeMin(): (String, Long) = {
    val (minC, minItem) = order.head
    order.remove((minC, minItem))
    counters.remove(minItem)
    (minItem, minC)
  }

  def add(item: String, weight: Long = 1L): Unit = {
    counters.get(item) match {
      case Some((c, e)) => put(item, c + weight, e)
      case None if counters.size < capacity => put(item, weight, 0L)
      case None =>
        val (_, minC) = removeMin()
        put(item, minC + weight, minC)
    }
  }

  /** Minimum counter value, or 0 if the sketch never evicted (not full):
    * the upper bound on the true count of any item absent from it.
    */
  private def minBound: Long =
    if (counters.size < capacity) 0L
    else order.head._1

  /** Mergeable-summaries SpaceSaving merge: common items add counts and
    * errors; an item present on only one side could have occurred up to
    * the other side's minimum on that side — add it to both the count and
    * the error so `true ∈ [est - err, est]` keeps holding after merges.
    */
  def merge(other: SpaceSavingSketch): Unit = {
    val minSelf = minBound
    val minOther = other.minBound
    val merged = mutable.HashMap.empty[String, (Long, Long)]
    counters.foreach { case (i, (c, e)) =>
      other.counters.get(i) match {
        case Some((c2, e2)) => merged.update(i, (c + c2, e + e2))
        case None => merged.update(i, (c + minOther, e + minOther))
      }
    }
    other.counters.foreach { case (i, (c, e)) =>
      if (!counters.contains(i)) merged.update(i, (c + minSelf, e + minSelf))
    }
    counters.clear()
    order.clear()
    if (merged.size > capacity) {
      merged.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(capacity)
        .foreach { case (i, (c, e)) => put(i, c, e) }
    } else merged.foreach { case (i, (c, e)) => put(i, c, e) }
  }

  def topK(k: Int): Seq[(String, Long, Long)] =
    counters.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(k)
      .map { case (i, (c, e)) => (i, c, e) }
}

/** agg expression: top-k items by estimated frequency →
  * array<struct<item string, est_count long, max_err long>>.
  */
case class TopKSketchAgg(child: Expression, k: Int, capacity: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSavingSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est_count", LongType, nullable = false),
    StructField("max_err", LongType, nullable = false))))

  override def createAggregationBuffer(): SpaceSavingSketch =
    new SpaceSavingSketch(capacity)

  override def update(buf: SpaceSavingSketch, input: InternalRow): SpaceSavingSketch = {
    val v = child.eval(input)
    if (v != null) buf.add(v.toString)
    buf
  }

  override def merge(buf: SpaceSavingSketch, other: SpaceSavingSketch): SpaceSavingSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: SpaceSavingSketch): Any = {
    val rows = buf.topK(k).map { case (item, c, e) =>
      InternalRow(UTF8String.fromString(item), c, e)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: SpaceSavingSketch): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.capacity)
    out.writeInt(buf.counters.size)
    buf.counters.foreach { case (i, (c, e)) =>
      val b = i.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingSketch = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val sk = new SpaceSavingSketch(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      sk.put(new String(b, "UTF-8"), in.readLong(), in.readLong())
      i += 1
    }
    sk
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKSketchAgg =
    copy(child = cs.head)
}

object sketch {
  /** top_k_freq(col, k): heavy hitters with bounded memory (capacity 8k). */
  def top_k_freq(c: Column, k: Int): Column =
    ColumnBridge.column(
      TopKSketchAgg(ColumnBridge.expression(c), k, capacity = k * 8)
        .toAggregateExpression())
}
