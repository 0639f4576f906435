package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** top_k_by(arg, ord, k): the k `arg` values with the largest `ord`
  * (desc, arg-asc tiebreak) — the n-ary generalization of max_by that
  * Spark lacks (generalizing the reference's argmax-by-mtime,
  * crocus base_scraper.py:96). TypedImperativeAggregate: a bounded
  * buffer of (ord, arg) pairs pruned to k as it grows, serialized as
  * longs for shuffle — constant memory per group at any scale, unlike
  * collect_list + slice which buffers the whole group. */
case class TopKByLong(arg: Expression, ord: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Long, Long)]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(arg, ord)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // render as the SQL-facing name in plans (default would be
  // "topkbylong"), so plan guards can assert the partial phase
  override def prettyName: String = "top_k_by"

  // ord desc, arg asc — via explicit Ordering, not arithmetic negation:
  // -Long.MinValue == Long.MinValue, so sortBy(-ord) would rank the most
  // negative measure as the largest.
  private val rankOrd: Ordering[(Long, Long)] =
    Ordering.by[(Long, Long), Long](_._1).reverse.orElseBy(_._2)

  private def prune(buf: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    if (buf.length > 4 * k) {
      val kept = buf.sorted(rankOrd).take(k)
      buf.clear(); buf ++= kept
    }
    buf
  }

  override def createAggregationBuffer(): ArrayBuffer[(Long, Long)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Long, Long)],
      input: InternalRow): ArrayBuffer[(Long, Long)] = {
    val o = ord.eval(input); val a = arg.eval(input)
    if (o != null && a != null) {
      buf += ((o.asInstanceOf[Long], a.asInstanceOf[Long]))
      prune(buf)
    }
    buf
  }

  override def merge(b1: ArrayBuffer[(Long, Long)],
      b2: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    b1 ++= b2; prune(b1)
  }

  override def eval(buf: ArrayBuffer[(Long, Long)]): Any =
    new GenericArrayData(
      buf.sorted(rankOrd).take(k).map(_._2).toArray)

  override def serialize(buf: ArrayBuffer[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 16)
    buf.foreach { case (o, a) => bb.putLong(o); bb.putLong(a) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = ArrayBuffer.empty[(Long, Long)]
    while (bb.remaining() >= 16) buf += ((bb.getLong(), bb.getLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByLong =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByLong =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByLong =
    copy(arg = newChildren(0), ord = newChildren(1))
}

object TopKByLong {
  def fromExprs(es: Seq[Expression]): TopKByLong = es(2) match {
    case Literal(v: Int, IntegerType) => TopKByLong(es(0), es(1), v)
    case other => throw new IllegalArgumentException(
      s"top_k_by k must be an int literal, got $other")
  }
}
