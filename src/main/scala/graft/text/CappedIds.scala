package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Df-capped id-list aggregate for inverted-index builds: per group,
  * collect up to `cap` BIGINT values; a group that EXCEEDS the cap
  * evaluates to NULL ("poisoned") and its collected state is freed at
  * the moment the cap breaks. This turns the df-cap of a similarity
  * index (drop shingles hotter than maxDf) into ONE aggregation pass:
  * the old shape needed a df count aggregate, an anti-join against the
  * hot list, and a SECOND evaluation of the shingle kernel to rebuild
  * the index rows.
  *
  * Scale safety is the point of the cap: a boilerplate shingle in 1%
  * of a 100 TB corpus sends billions of rows at one key — a plain
  * `collect_list` would hold them all in one aggregation buffer. This
  * buffer never holds more than cap+1 values regardless of the key's
  * true frequency (update poisons at cap+1 and frees the array;
  * partial buffers merge map-side, each ≤ cap+1), so the hottest key
  * costs O(cap) state per mapper and its occurrences are discarded at
  * the combine, never concentrated.
  *
  * Output-set determinism: the ARRAY ORDER is arrival order (partition
  * dependent), but a capped group's value multiset is exact and
  * complete, so any order-insensitive consumer (explode → join/agg) is
  * partition-invariant. Do not feed it into order-sensitive folds.
  */
final class CappedLongs(val cap: Int) {
  var poisoned: Boolean = false
  var n: Int = 0
  var arr: Array[Long] = CappedLongs.Empty

  def add(v: Long): Unit = {
    if (poisoned) return
    if (n >= cap) { poison(); return }
    if (n == arr.length)
      arr = java.util.Arrays.copyOf(arr, math.min(math.max(8, n * 2), cap))
    arr(n) = v
    n += 1
  }

  def poison(): Unit = { poisoned = true; n = 0; arr = CappedLongs.Empty }
}

object CappedLongs { private[text] val Empty = Array.emptyLongArray }

case class CappedIdsAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CappedLongs] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (cap < 1) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires cap >= 1, got $cap")
    else if (child.dataType != LongType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT argument, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): CappedLongs = new CappedLongs(cap)

  override def update(buf: CappedLongs,
      input: org.apache.spark.sql.catalyst.InternalRow): CappedLongs = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: CappedLongs, other: CappedLongs): CappedLongs = {
    if (other.poisoned) buf.poison()
    else {
      var i = 0
      while (i < other.n && !buf.poisoned) { buf.add(other.arr(i)); i += 1 }
    }
    buf
  }

  override def eval(buf: CappedLongs): Any =
    if (buf.poisoned) null
    else new GenericArrayData(java.util.Arrays.copyOf(buf.arr, buf.n))

  override def serialize(buf: CappedLongs): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(5 + 8 * buf.n)
    bb.put(if (buf.poisoned) 1.toByte else 0.toByte)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedLongs = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new CappedLongs(cap)
    val poisoned = bb.get() == 1
    if (poisoned) buf.poison()
    else {
      val n = bb.getInt
      var i = 0
      while (i < n) { buf.add(bb.getLong); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): CappedIdsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CappedIdsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

object CappedIds {
  import org.apache.spark.sql.GraftExprBridge._

  /** capped id-list aggregate over a BIGINT column: array of the
    * group's values if the group has ≤ cap rows, else NULL
    */
  def cappedIds(e: Column, cap: Int): Column =
    toColumn(CappedIdsAgg(toExpression(e), cap).toAggregateExpression())
}
