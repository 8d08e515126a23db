package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}

/** Per-GROUP distinct-count estimate via a bottom-k (KMV) sketch — the
  * grouped form of `Dedup.distinctCount`: "distinct shingles per lang",
  * "distinct urls per source", usable directly inside any `groupBy`.
  *
  * Input is a PRE-HASHED 60-bit long (`TextAnalysis.hash60`), keeping
  * the hash function visible in the query plan and mirrorable in SQL.
  * The k-th smallest of n distinct uniform 60-bit hashes sits near k/n
  * of the range, so `est = (k-1) · 2^60 / h_k` (±1/√k); when a group
  * holds fewer than k distinct hashes the sketch holds all of them and
  * the count is EXACT. The estimate is ONE IEEE multiply + divide over
  * exactly-representable operands, so it is bit-identical cross-engine
  * (no rounding needed).
  *
  * Scale shape: the buffer is a bounded size-k distinct set, so
  * map-side partial aggregation applies (each task ships at most k
  * longs per group, never the group's distinct set) and merge is a
  * bounded set union — the per-group analogue of `COUNT(DISTINCT x)`
  * without its distinct-set-sized exchange. Memory per group is
  * 8·k bytes bounded, unlike exact distinct whose state is unbounded.
  *
  * Nulls are ignored; a group with no non-null input reports 0.0.
  */
case class KmvDistinct(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongKmvBuf] with BinaryLike[Expression] {

  override def left: Expression = child
  override def right: Expression = kExpr

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def prettyName: String = "graft_kmv_distinct"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_distinct requires a pre-hashed BIGINT input, got ${child.dataType.sql}")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("graft_kmv_distinct k must be an int literal")
    else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Number].intValue() < 2)
      TypeCheckResult.TypeCheckFailure("graft_kmv_distinct k must be >= 2")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): LongKmvBuf = new LongKmvBuf(k)

  override def update(buf: LongKmvBuf, input: InternalRow): LongKmvBuf = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: LongKmvBuf, other: LongKmvBuf): LongKmvBuf = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: LongKmvBuf): Any = {
    val n = buf.size
    if (n < k) n.toDouble
    else (k - 1).toDouble * math.pow(2.0, 60) / buf.kth.toDouble
  }

  override def serialize(buf: LongKmvBuf): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): LongKmvBuf =
    LongKmvBuf.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvDistinct =
    copy(child = newLeft, kExpr = newRight)
}

/** The SET-valued sibling of [[KmvDistinct]]: per group, the bottom-k
  * distinct hash SKETCH itself (ascending `array<bigint>`, ≤ k entries)
  * rather than the collapsed estimate. Sketches are the persistable /
  * composable form — union two sketches' bottom-k and you have the
  * sketch of the union corpus (the incremental-crawl merge), intersect
  * them against their union's bottom-k and you have the KMV Jaccard
  * numerator ([[graft.operators.Dedup.corpusOverlapMatrix]]). Same
  * bounded-buffer scale shape as [[KmvDistinct]]. */
case class KmvSketch(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongKmvBuf] with BinaryLike[Expression] {

  override def left: Expression = child
  override def right: Expression = kExpr

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def prettyName: String = "graft_kmv_sketch"
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_sketch requires a pre-hashed BIGINT input, got ${child.dataType.sql}")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("graft_kmv_sketch k must be an int literal")
    else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Number].intValue() < 1)
      TypeCheckResult.TypeCheckFailure("graft_kmv_sketch k must be >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): LongKmvBuf = new LongKmvBuf(k)

  override def update(buf: LongKmvBuf, input: InternalRow): LongKmvBuf = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: LongKmvBuf, other: LongKmvBuf): LongKmvBuf = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: LongKmvBuf): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.toArray)

  override def serialize(buf: LongKmvBuf): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): LongKmvBuf =
    LongKmvBuf.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvSketch =
    copy(child = newLeft, kExpr = newRight)
}

/** Bounded bottom-k DISTINCT long set: a TreeSet capped at k entries —
  * insert is a no-op unless the value is new AND below the current k-th
  * smallest (or the set is not yet full). */
final class LongKmvBuf(k: Int) {
  private val set = new java.util.TreeSet[java.lang.Long]()

  def insert(h: Long): Unit =
    if (set.size < k) { set.add(h); () }
    // add() returns false for an already-present hash — only a REAL
    // insertion may evict the current k-th
    else if (h < set.last && set.add(h)) { set.pollLast(); () }

  def mergeFrom(other: LongKmvBuf): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) insert(it.next())
  }

  def size: Int = set.size
  def kth: Long = set.last

  /** Ascending snapshot of the sketch. */
  def toArray: Array[Long] = {
    val arr = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    arr
  }

  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * set.size)
    bb.putInt(set.size)
    val it = set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }
}

object LongKmvBuf {
  def fromBytes(k: Int, bytes: Array[Byte]): LongKmvBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new LongKmvBuf(k)
    var i = 0
    while (i < n) { buf.insert(bb.getLong); i += 1 }
    buf
  }
}
