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

/** Top-k-by-priority mergeable aggregate — the grouped/streaming face
  * of priority sampling (Duffield-Lund-Thorup): the buffer holds the k
  * entries with the highest (priority, id)-order, merge is
  * union-then-trim, so the result is partitioning- and merge-order-
  * independent — the same state-store contract as [[KmvAgg]]. Callers
  * pass k = sampleSize + 1 so the (k)th entry exposes the estimator
  * threshold τ. Entries are (priority, id, weight) structs, priority
  * DESC then id ASC; ids must be distinct per group (the dedup key).
  */
case class TopKPriorityAgg(
    pri: Expression,
    id: Expression,
    weight: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[TopKPriorityAgg.Entry]]
  with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression] {

  import TopKPriorityAgg.Entry

  require(k >= 1, s"top-k priority sketch needs k >= 1, got $k")

  override def first: Expression = pri
  override def second: Expression = id
  override def third: Expression = weight

  override def createAggregationBuffer(): java.util.TreeSet[Entry] =
    new java.util.TreeSet[Entry](TopKPriorityAgg.ord)

  private def insert(buf: java.util.TreeSet[Entry], e: Entry): Boolean = {
    if (buf.size < k) { buf.add(e); true }
    else if (TopKPriorityAgg.ord.compare(e, buf.last) < 0) {
      // evict ONLY when something was actually inserted: for a
      // duplicate entry add() returns false, and an unconditional
      // pollLast() would shrink the sample and shift the τ slot.
      // Still report accepted — a duplicate is within top-k order, so
      // merge's best-first early-stop must keep scanning.
      if (buf.add(e)) { buf.pollLast(): Unit }
      true
    } else false
  }

  override def update(
      buf: java.util.TreeSet[Entry], input: InternalRow): java.util.TreeSet[Entry] = {
    val p = pri.eval(input)
    val i = id.eval(input)
    val w = weight.eval(input)
    if (p != null && i != null && w != null)
      insert(buf, Entry(p.asInstanceOf[Double], i.asInstanceOf[Long], w.asInstanceOf[Double]))
    buf
  }

  override def merge(
      buf: java.util.TreeSet[Entry], other: java.util.TreeSet[Entry]): java.util.TreeSet[Entry] = {
    // other iterates best-first: stop at the first rejected entry
    val it = other.iterator()
    var more = true
    while (more && it.hasNext) more = insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[Entry]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = InternalRow(e.pri, e.id, e.weight)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[Entry]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 24 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putDouble(e.pri); bb.putLong(e.id); bb.putDouble(e.weight)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Entry] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(Entry(bb.getDouble, bb.getLong, bb.getDouble)); i += 1 }
    buf
  }

  override def dataType: DataType = TopKPriorityAgg.outType
  override def nullable: Boolean = false
  override def prettyName: String = "topk_priority"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPriorityAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPriorityAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TopKPriorityAgg =
    copy(pri = newFirst, id = newSecond, weight = newThird)
}

object TopKPriorityAgg {
  final case class Entry(pri: Double, id: Long, weight: Double)

  /** Priority DESC, id ASC — total order, deterministic under ties. */
  val ord: java.util.Comparator[Entry] = new java.util.Comparator[Entry] {
    override def compare(a: Entry, b: Entry): Int = {
      val c = java.lang.Double.compare(b.pri, a.pri)
      if (c != 0) c else java.lang.Long.compare(a.id, b.id)
    }
  }

  val outType: DataType = ArrayType(StructType(Seq(
    StructField("pri", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("weight", DoubleType, nullable = false))), containsNull = false)
}

/** Bottom-k-by-hash mergeable aggregate — the grouped face of the
  * deterministic bottom-k sample ([[graft.ops.Sketches.bottomKSample]]
  * as ONE aggregation instead of a per-key rank window): the buffer
  * holds the k entries with the smallest (hash, id) order plus their
  * payload value; merge is union-then-trim. Partitioning- and
  * merge-order-independent like [[KmvAgg]], so map-side partials ship
  * ≤k entries per group per task where the window form shuffles EVERY
  * sampled row to its key's partition — the difference between
  * O(k·groups) and O(rows) shuffle bytes at 100 TB.
  *
  * The hash stays an exact LongType throughout ([[TopKPriorityAgg]]'s
  * double priority would collapse 60-bit hashes beyond 2⁵³ onto equal
  * doubles and reshuffle the tie-break, diverging from a SQL replay
  * that orders by the exact integer hash). Ids must be non-null and
  * distinct per group — they are the sample's dedup key. */
case class BottomKHashAgg(
    h: Expression,
    id: Expression,
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[BottomKHashAgg.Entry]]
  with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression] {

  import BottomKHashAgg.Entry

  require(k >= 1, s"bottom-k hash sample needs k >= 1, got $k")

  override def first: Expression = h
  override def second: Expression = id
  override def third: Expression = value

  override def createAggregationBuffer(): java.util.TreeSet[Entry] =
    new java.util.TreeSet[Entry](BottomKHashAgg.ord)

  private def insert(buf: java.util.TreeSet[Entry], e: Entry): Boolean = {
    if (buf.size < k) { buf.add(e); true }
    else if (BottomKHashAgg.ord.compare(e, buf.last) < 0) {
      // evict only when something was actually inserted (duplicate
      // entries must not shrink the sample — same guard as
      // TopKPriorityAgg.insert)
      if (buf.add(e)) { buf.pollLast(): Unit }
      true
    } else false
  }

  override def update(
      buf: java.util.TreeSet[Entry], input: InternalRow): java.util.TreeSet[Entry] = {
    val hv = h.eval(input)
    val iv = id.eval(input)
    val vv = value.eval(input)
    if (hv != null && iv != null && vv != null)
      insert(buf, Entry(hv.asInstanceOf[Long], iv.asInstanceOf[Long], vv.asInstanceOf[Double]))
    buf
  }

  override def merge(
      buf: java.util.TreeSet[Entry], other: java.util.TreeSet[Entry]): java.util.TreeSet[Entry] = {
    // other iterates best (smallest) first: stop at the first reject
    val it = other.iterator()
    var more = true
    while (more && it.hasNext) more = insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[Entry]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = InternalRow(e.h, e.id, e.value)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[Entry]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 24 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.h); bb.putLong(e.id); bb.putDouble(e.value)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Entry] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(Entry(bb.getLong, bb.getLong, bb.getDouble)); i += 1 }
    buf
  }

  override def dataType: DataType = BottomKHashAgg.outType
  override def nullable: Boolean = false
  override def prettyName: String = "bottomk_hash"

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BottomKHashAgg =
    copy(h = newFirst, id = newSecond, value = newThird)
}

object BottomKHashAgg {
  final case class Entry(h: Long, id: Long, value: Double)

  /** Hash ASC, id ASC — total order, deterministic under ties,
    * EXACT on the full 60-bit hash (no double round-trip). */
  val ord: java.util.Comparator[Entry] = new java.util.Comparator[Entry] {
    override def compare(a: Entry, b: Entry): Int = {
      val c = java.lang.Long.compare(a.h, b.h)
      if (c != 0) c else java.lang.Long.compare(a.id, b.id)
    }
  }

  val outType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false))), containsNull = false)
}

/** [[BottomKHashAgg]] for ARBITRARY id types, carried as STRING
  * (round-16, verdict-15 item 7): the id expression must be cast to
  * string by the caller; selection stays (h ASC, id ASC) with the id
  * tie-break in UTF8 binary order — identical to Spark's string
  * ordering, so for string-keyed data the sample is entry-for-entry
  * the one the window form selects. This retires the O(rows)-shuffle
  * windowed fallback as a silently-chosen path: every id type now has
  * a ≤k-per-group-per-task mergeable aggregate.
  *
  * UTF8String inputs are CLONED into the buffer: eval() hands back a
  * slice of a reused unsafe row whose bytes the next input overwrites. */
case class BottomKHashStrAgg(
    h: Expression,
    id: Expression,
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[BottomKHashStrAgg.Entry]]
  with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression] {

  import BottomKHashStrAgg.Entry

  require(k >= 1, s"bottom-k hash sample needs k >= 1, got $k")

  override def first: Expression = h
  override def second: Expression = id
  override def third: Expression = value

  override def createAggregationBuffer(): java.util.TreeSet[Entry] =
    new java.util.TreeSet[Entry](BottomKHashStrAgg.ord)

  private def insert(buf: java.util.TreeSet[Entry], e: Entry): Boolean = {
    if (buf.size < k) { buf.add(e); true }
    else if (BottomKHashStrAgg.ord.compare(e, buf.last) < 0) {
      if (buf.add(e)) { buf.pollLast(): Unit }
      true
    } else false
  }

  override def update(
      buf: java.util.TreeSet[Entry], input: InternalRow): java.util.TreeSet[Entry] = {
    val hv = h.eval(input)
    val iv = id.eval(input)
    val vv = value.eval(input)
    if (hv != null && iv != null && vv != null)
      insert(buf, Entry(hv.asInstanceOf[Long],
        iv.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].clone(),
        vv.asInstanceOf[Double]))
    buf
  }

  override def merge(
      buf: java.util.TreeSet[Entry], other: java.util.TreeSet[Entry]): java.util.TreeSet[Entry] = {
    val it = other.iterator()
    var more = true
    while (more && it.hasNext) more = insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[Entry]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = InternalRow(e.h, e.id, e.value)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[Entry]): Array[Byte] = {
    var bytes = 4
    val sizes = new Array[Int](buf.size)
    val it0 = buf.iterator(); var j = 0
    while (it0.hasNext) {
      sizes(j) = it0.next().id.numBytes(); bytes += 20 + sizes(j); j += 1
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.h); bb.putDouble(e.value)
      val idb = e.id.getBytes
      bb.putInt(idb.length); bb.put(idb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Entry] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val h = bb.getLong; val v = bb.getDouble
      val len = bb.getInt; val idb = new Array[Byte](len); bb.get(idb)
      buf.add(Entry(h, org.apache.spark.unsafe.types.UTF8String.fromBytes(idb), v))
      i += 1
    }
    buf
  }

  override def dataType: DataType = BottomKHashStrAgg.outType
  override def nullable: Boolean = false
  override def prettyName: String = "bottomk_hash_str"

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKHashStrAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKHashStrAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BottomKHashStrAgg =
    copy(h = newFirst, id = newSecond, value = newThird)
}

object BottomKHashStrAgg {
  final case class Entry(
      h: Long, id: org.apache.spark.unsafe.types.UTF8String, value: Double)

  /** Hash ASC, id ASC (UTF8 binary = Spark string order) — total
    * order, deterministic under ties, exact on the 60-bit hash. */
  val ord: java.util.Comparator[Entry] = new java.util.Comparator[Entry] {
    override def compare(a: Entry, b: Entry): Int = {
      val c = java.lang.Long.compare(a.h, b.h)
      if (c != 0) c else a.id.compareTo(b.id)
    }
  }

  val outType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("id", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false))), containsNull = false)
}

/** HyperLogLog registers as a native mergeable aggregate — the
  * single-aggregation / STREAMING face of
  * [[graft.ops.Sketches.hllDistinctByKey]]'s two-level relational
  * form. The buffer is the m-byte register array (max rho per bucket)
  * over a 60-bit hash input; merge is elementwise max — commutative,
  * associative, idempotent — so the result is partitioning- and
  * merge-order-independent and safe as state-store state (the same
  * contract as [[KmvAgg]]). eval returns the registers as array<int>;
  * [[graft.ops.Sketches.hllEstimateFromRegisters]] turns them into the
  * estimate with arithmetic bit-identical to the relational form
  * (integer harmonic sum, same alpha/branches), so both faces
  * hash-match the same oracle. Map tasks ship m bytes per group where
  * the relational form ships ≤m (bucket, rho) rows — same bound,
  * one shuffle instead of two. */
case class HllRegistersAgg(
    child: Expression,
    b: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  require(b >= 4 && b <= 16, s"hll needs 4 <= b <= 16, got $b")
  private val m = 1 << b
  private val low = 60 - b
  private val mask = (1L << low) - 1

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bkt = (h >>> low).toInt
      val w = h & mask
      // rho = leading-zero count within the low bits + 1
      //     = (low + 1) - bitlength(w); w = 0 -> low + 1
      val rho =
        if (w == 0L) low + 1
        else low + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(bkt)) buf(bkt) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Int](m)
    var i = 0
    while (i < m) { out(i) = buf(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  // defensive copies: the buffer is mutated in place by update/merge,
  // and the serialized image may be retained by the row it was written
  // into — aliasing the two would corrupt spilled partials
  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hll_registers"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegistersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegistersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllRegistersAgg =
    copy(child = newChild)
}

object SketchFunctions {
  /** k smallest distinct values of a LongType hash column, ascending. */
  def kmvMins(h: Column, k: Int): Column =
    Bridge.column(KmvAgg(Bridge.expression(h), k).toAggregateExpression())

  /** HLL register array (max rho per bucket) of a 60-bit hash column. */
  def hllRegisters(h: Column, b: Int): Column =
    Bridge.column(HllRegistersAgg(Bridge.expression(h), b).toAggregateExpression())

  /** k best (priority DESC, id) entries as an array of
    * (pri, id, weight) structs, best first. */
  def topKByPriority(pri: Column, id: Column, weight: Column, k: Int): Column =
    Bridge.column(TopKPriorityAgg(
      Bridge.expression(pri), Bridge.expression(id), Bridge.expression(weight), k)
      .toAggregateExpression())

  /** k smallest (hash, id) entries with payload, as an array of
    * (h, id, value) structs ascending. h and id LongType, value
    * DoubleType. */
  def bottomKByHash(h: Column, id: Column, value: Column, k: Int): Column =
    Bridge.column(BottomKHashAgg(
      Bridge.expression(h), Bridge.expression(id), Bridge.expression(value), k)
      .toAggregateExpression())

  /** [[bottomKByHash]] with a STRING id (arbitrary key types, caller
    * casts): k smallest (hash, id) entries, id tie-break in UTF8
    * binary (= Spark string) order. */
  def bottomKByHashStr(h: Column, id: Column, value: Column, k: Int): Column =
    Bridge.column(BottomKHashStrAgg(
      Bridge.expression(h), Bridge.expression(id), Bridge.expression(value), k)
      .toAggregateExpression())
}
