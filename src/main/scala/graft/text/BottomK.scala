package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Mergeable bottom-k sketch aggregate: the k smallest DISTINCT long
  * values per group, as a sorted array — a custom Catalyst
  * `TypedImperativeAggregate` (the engine's one aggregate-function
  * extension; scalar extensions are the codegen Expressions).
  *
  * Why an imperative aggregate and not a rank window: bottom-k per
  * group via `row_number() ≤ k` must SORT every group's full distinct
  * hash set — at 100 TB that is a full per-group sort of billions of
  * rows. This buffer is a capped ordered set (O(k) state), updates are
  * O(log k), and partial buffers MERGE — so the plan is a standard
  * partial/final hash aggregate whose shuffle carries one ≤k-element
  * sketch per group per mapper, never the hash universe.
  *
  * The bottom-k sketch is the classic distinct-value/similarity sketch
  * (KMV — Bar-Yossef et al. 2002; Beyer et al., SIGMOD 2007):
  * bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B)), so
  * group sketches compose into pairwise Jaccard estimates downstream.
  * Deterministic: the k smallest distinct values of a set do not
  * depend on arrival order or partitioning.
  */
case class BottomKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires k >= 1, got $k")
    else if (child.dataType != LongType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT argument, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def trim(buf: java.util.TreeSet[java.lang.Long]): Unit =
    while (buf.size() > k) buf.pollLast()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: org.apache.spark.sql.catalyst.InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val l = v.asInstanceOf[Long]
      // skip values that cannot enter a full sketch (O(1) fast path)
      if (buf.size() < k || l < buf.last()) { buf.add(l); trim(buf) }
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    buf.addAll(other)
    trim(buf)
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BottomKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BottomKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

object BottomK {
  import org.apache.spark.sql.GraftExprBridge._

  /** bottom-k aggregate Column over a BIGINT column */
  def bottomK(e: Column, k: Int): Column =
    toColumn(BottomKAgg(toExpression(e), k).toAggregateExpression())
}
