package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession, functions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Sketch-shaped native aggregates.
  *
  * [[BottomKLongs]] is the exchange-bounding form of the grouped
  * bottom-k (KMV) selection: a `TypedImperativeAggregate` whose buffer
  * is the group's ≤ k smallest DISTINCT longs. Because it is a real
  * Catalyst aggregate, it gets PARTIAL aggregation for free — every
  * task collapses its slice of a group to ≤ k eight-byte values before
  * anything reaches the exchange, so the shuffle carries
  * tasks × groups-per-task × k longs instead of the full distinct
  * (group, hash) stream — and ObjectHashAggregateExec's sort-based
  * fallback bounds MEMORY at high group cardinality (past the fallback
  * threshold it sorts by group key and aggregates groups one at a
  * time), which is exactly the hazard that previously pushed
  * `Kmv.sketchBy` onto a two-level salted window. The window shape paid
  * for that safety by shipping every distinct (group, hash) pair
  * through its level-1 exchange; this aggregate keeps the safety AND
  * the partitions×k exchange the global sketch already has
  * (`Kmv.sketch`'s per-partition TreeSet pass — same lattice argument:
  * bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B))).
  *
  * Determinism: a pure order statistic over the input multiset — the
  * result is the sorted-ascending array of the k smallest distinct
  * values, independent of partitioning, merge order, and retries.
  * NULL inputs are not observations (count-distinct semantics).
  */
case class BottomKLongs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.TreeSet[Long]] {

  require(k >= 1, s"bottom_k: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bottom_k"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bottom_k requires a bigint input, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): scala.collection.mutable.TreeSet[Long] =
    scala.collection.mutable.TreeSet.empty[Long]

  /** Bounded insert: O(1) reject once the buffer is full (one compare
    * against the current max — the common case on a big group), O(log k)
    * when the candidate displaces the max. The TreeSet dedups, so the
    * buffer holds DISTINCT values — duplicates never crowd out true
    * bottom-k members. */
  private def insert(buf: scala.collection.mutable.TreeSet[Long],
      h: Long): Unit =
    if (buf.size < k) buf += h
    else if (h < buf.lastKey && !buf.contains(h)) {
      buf += h
      buf -= buf.lastKey
    }

  override def update(buf: scala.collection.mutable.TreeSet[Long],
      input: InternalRow): scala.collection.mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: scala.collection.mutable.TreeSet[Long],
      other: scala.collection.mutable.TreeSet[Long]): scala.collection.mutable.TreeSet[Long] = {
    other.foreach(insert(buf, _))
    buf
  }

  /** Sorted ascending — the TreeSet's own iteration order. */
  override def eval(buf: scala.collection.mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: scala.collection.mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = scala.collection.mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { buf += bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKLongs =
    copy(child = newChildren.head)
}

/** Registration + Column wrappers (the [[ShingleExprs]] pattern: int
  * params pass as literals and are extracted at function-build time;
  * the analyzer wraps the returned AggregateFunction in an
  * AggregateExpression like any built-in aggregate). */
object SketchExprs {
  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    reg.createOrReplaceTempFunction("bottom_k",
      es => BottomKLongs(es.head, ShingleExprs.foldInt(es(1))), "built-in")
  }

  /** Requires [[register]] on the active session. */
  def bottomK(values: Column, k: Int): Column =
    functions.call_function("bottom_k", values, functions.lit(k))
}
