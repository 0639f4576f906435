package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** minhash_sig(baseHash, nSig): the full nSig-lane minhash signature in
  * ONE aggregate pass. Each lane re-mixes the 64-bit shingle hash with
  * a deterministic seed (murmur3 finalizer — public algorithm) and
  * keeps the minimum; merge is elementwise min, so the aggregate is
  * associative/commutative and partial-aggregates map-side.
  *
  * Replaces nSig separate min(xxhash64(...)) columns: one buffer, one
  * generated update loop, nSig× less codegen — the practical way to
  * compute wide signatures at 100 TB. */
case class MinHashSig(child: Expression, nSig: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(nSig > 0 && nSig <= 512)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(nSig)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val base = v.asInstanceOf[Long]
      var i = 0
      while (i < nSig) {
        val h = MinHashSig.fmix64(base ^ MinHashSig.seed(i))
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nSig) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(offset: Int): MinHashSig =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashSig =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSig =
    copy(child = newChildren.head)
}

object MinHashSig {
  /** murmur3 64-bit finalizer (public domain algorithm). */
  def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33; x
  }

  /** deterministic per-lane seed: golden-ratio sequence. */
  def seed(i: Int): Long = 0x9e3779b97f4a7c15L * (i + 1)

  def fromExprs(es: Seq[Expression]): MinHashSig = es(1) match {
    case Literal(v: Int, IntegerType) => MinHashSig(es.head, v)
    case other => throw new IllegalArgumentException(
      s"minhash_sig nSig must be an int literal, got $other")
  }
}
