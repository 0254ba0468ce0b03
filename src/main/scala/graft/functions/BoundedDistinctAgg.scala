package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Distinct-set aggregate with a hard element cap — the skew-proof
 * building block for document-frequency caps over shingle postings.
 *
 * Buffer = a distinct set of longs that stops growing at `cap`
 * elements. For a group whose TRUE distinct count is < cap, no partial
 * buffer can ever truncate (every partial set is a subset of the true
 * set), so the merged result is the exact distinct set. For a group at
 * or over the cap, the buffer saturates at `cap` elements — enough to
 * signal "over the df limit" — and both memory and shuffle bytes stay
 * bounded at `cap` longs per partial REGARDLESS of how hot the key is.
 * That is what makes a df-cap over a ubiquitous shingle (billions of
 * postings at 100 TB) safe: map-side partial aggregation collapses
 * each partition's postings into one ≤cap buffer, where a count-over-
 * window formulation would sort ALL of the hot key's rows in a single
 * reducer task.
 *
 * eval() emits the set as a SORTED array<long> (deterministic output
 * for exact groups; saturated groups are filtered by the caller).
 */
case class BoundedDistinctLongsAgg(
    child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashSet[Long]] {
  require(cap >= 1, "cap must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.HashSet[Long] =
    new java.util.HashSet[Long]()

  override def update(
      buf: java.util.HashSet[Long], input: InternalRow): java.util.HashSet[Long] = {
    val v = child.eval(input)
    // saturated ⇒ the group is over the df limit whatever else arrives
    if (v != null && buf.size < cap) buf.add(v.asInstanceOf[Long]): Unit
    buf
  }

  override def merge(
      buf: java.util.HashSet[Long], other: java.util.HashSet[Long]): java.util.HashSet[Long] = {
    val it = other.iterator()
    while (it.hasNext && buf.size < cap) buf.add(it.next()): Unit
    buf
  }

  override def eval(buf: java.util.HashSet[Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.HashSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    val lb = bb.asLongBuffer()
    val it = buf.iterator()
    while (it.hasNext) lb.put(it.next()): Unit
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashSet[Long] = {
    val out = new java.util.HashSet[Long]()
    val lb = ByteBuffer.wrap(bytes).asLongBuffer()
    while (lb.hasRemaining) out.add(lb.get()): Unit
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedDistinctLongsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedDistinctLongsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))

  override def prettyName: String = "bounded_distinct_longs"
}

/**
 * The k SMALLEST distinct longs of a group, as a sorted array<long> —
 * the posting-list-prefix primitive of an inverted index.
 *
 * Unlike a `row_number() <= k` window (which sorts ALL of a hot key's
 * rows in one reducer task) this is a TypedImperativeAggregate with
 * map-side partial combine: each map partition ships one ≤k buffer per
 * group, so a stopword token whose postings span billions of documents
 * at 100 TB costs the same shuffle bytes as a rare one. Exactness under
 * partial merge holds because "k smallest distinct of a union" equals
 * "k smallest distinct of the per-partial k-smallest sets".
 */
case class MinKDistinctLongsAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[Long]] {
  require(k >= 1, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  private def add(buf: java.util.TreeSet[Long], v: Long): Unit =
    if (buf.size < k) buf.add(v): Unit
    else if (v < buf.last && buf.add(v)) buf.pollLast(): Unit

  override def update(
      buf: java.util.TreeSet[Long], input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[Long], other: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out) // TreeSet iterates ascending — already sorted
  }

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    val lb = bb.asLongBuffer()
    val it = buf.iterator()
    while (it.hasNext) lb.put(it.next()): Unit
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val out = new java.util.TreeSet[Long]()
    val lb = ByteBuffer.wrap(bytes).asLongBuffer()
    while (lb.hasRemaining) out.add(lb.get()): Unit
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKDistinctLongsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKDistinctLongsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))

  override def prettyName: String = "min_k_distinct_longs"
}
