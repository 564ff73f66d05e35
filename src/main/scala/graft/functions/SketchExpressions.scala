package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct sketch as a native mergeable
  * aggregate (Bar-Yossef et al. 2002, public literature).
  *
  * The buffer holds the `k` smallest DISTINCT values of a 60-bit hash
  * column; merge is set-union-then-trim, so the result is independent
  * of partitioning and merge order — a DETERMINISTIC sketch, unlike
  * `approx_count_distinct`'s HLL (whose register layout is
  * engine-private and non-replayable). Because the k-min set is a pure
  * function of the input SET, a DuckDB oracle replays it exactly:
  * `SELECT DISTINCT h ... ORDER BY h LIMIT k`.
  *
  * This is the communication-bounded path for distinct counting at
  * 100 TB: each map task ships at most `k` longs (partial aggregation
  * happens before the shuffle, as with any ImperativeAggregate), where
  * a `count(DISTINCT x)` shuffles every distinct value. Estimate from
  * the returned array: exact size when |mins| < k, else
  * (k-1)·2⁶⁰ / mins[k-1] — arithmetic on exactly-representable
  * doubles, so the estimate itself bit-matches the oracle.
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"KMV sketch needs k >= 2, got $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // only insert if it would make the k-min set (avoids churn on
      // the common below-threshold case)
      if (buf.size < k) buf.add(h)
      else if (h < buf.last) { buf.add(h); if (buf.size > k) buf.pollLast() }
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    // other iterates ascending: once a value cannot enter the k-min
    // set, no later value can either — early exit
    val it = other.iterator()
    var more = true
    while (more && it.hasNext) {
      val h = it.next()
      if (buf.size < k) buf.add(h)
      else if (h < buf.last) { buf.add(h); if (buf.size > k) buf.pollLast() }
      else more = false
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_mins"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}

object SketchFunctions {
  /** k smallest distinct values of a LongType hash column, ascending. */
  def kmvMins(h: Column, k: Int): Column =
    Bridge.column(KmvAgg(Bridge.expression(h), k).toAggregateExpression())
}
