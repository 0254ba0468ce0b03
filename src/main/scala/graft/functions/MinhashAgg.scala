package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * k-component MinHash signature as ONE typed aggregate: buffer is a
 * long[k], update folds hash_i = sh XOR rotl(h2, i) into component-wise
 * minima. Replaces k separate `min(...)` aggregate expressions — one
 * buffer instead of k codegen'd agg columns, and the signature ships
 * downstream as a single array<long> column (one narrow column through
 * every later shuffle instead of k).
 *
 * Semantics match the expression formulation exactly: Java shift
 * semantics (shift count mod 64) equal Spark's shiftleft /
 * shiftrightunsigned, and min is the signed long minimum.
 */
case class MinhashSignatureAgg(
    sh: Expression, h2: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(k >= 1 && k <= 64, "rotation family supports k <= 64")

  override def children: Seq[Expression] = Seq(sh, h2)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val s = sh.eval(input)
    val h = h2.eval(input)
    if (s != null && h != null) {
      val sv = s.asInstanceOf[Long]
      val hv = h.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val v = sv ^ ((hv << i) | (hv >>> (64 - i)))
        if (v < buf(i)) buf(i) = v
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (other(i) < buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](k)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinhashSignatureAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinhashSignatureAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(sh = newChildren(0), h2 = newChildren(1))

  override def prettyName: String = "minhash_signature"
}

/**
 * SimHash signature as ONE typed aggregate: buffer is a long[bits] of
 * weighted bit votes (+w if the token hash has the bit set, −w
 * otherwise); eval packs `vote > 0` bits into a single long. Replaces
 * `bits` separate conditional-sum aggregate columns with one buffer,
 * exactly preserving the per-bit integer vote arithmetic of the
 * expression formulation (and of the SQL oracle).
 */
case class SimhashSignatureAgg(
    h: Expression, w: Expression, bits: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(bits >= 1 && bits <= 63, "bit votes pack into one signed long")

  override def children: Seq[Expression] = Seq(h, w)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val hv = h.eval(input)
    val wv = w.eval(input)
    if (hv != null && wv != null) {
      val hl = hv.asInstanceOf[Long]
      val wl = wv.asInstanceOf[Long]
      var b = 0
      while (b < bits) {
        if (((hl >> b) & 1L) == 1L) buf(b) += wl else buf(b) -= wl
        b += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var b = 0
    while (b < bits) { buf(b) += other(b); b += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    var sig = 0L
    var b = 0
    while (b < bits) { if (buf(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * bits)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bits)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashSignatureAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashSignatureAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(h = newChildren(0), w = newChildren(1))

  override def prettyName: String = "simhash_signature"
}
