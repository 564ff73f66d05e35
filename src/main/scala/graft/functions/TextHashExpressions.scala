package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Static hashing kernels the generated code calls (same design as
  * graft.stats.DistMath): plain static invocations keep the work
  * codegen-resident with zero boxing beyond the input ArrayData. */
object TextHash {
  /** 2⁶¹−1, the Mersenne prime backing the universal hash family. An
    * external engine replays `(a·h + b) mod p` exactly with 128-bit
    * integer arithmetic (DuckDB HUGEINT) — the whole minhash family is
    * therefore oracle-checkable, which xxhash64 (absent from every SQL
    * engine) is not. */
  val P61: Long = (1L << 61) - 1

  /** SplitMix64 (public-domain mixer) — drives the slot coefficients
    * here and the LSH plane constants in graft.sim.Similarity (one
    * definition of a determinism-critical primitive). */
  private[graft] def splitMix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Universal-hash slot coefficients (a ∈ [1, p−1], b ∈ [0, p−1]):
    * pure functions of the slot index, so an oracle inlines them as
    * integer literals. */
  def slotCoefs(numHashes: Int): Array[(Long, Long)] =
    Array.tabulate(numHashes) { i =>
      val a = java.lang.Long.remainderUnsigned(
        splitMix64(1000003L * i + 0x9e3779b9L), P61 - 1) + 1
      val b = java.lang.Long.remainderUnsigned(
        splitMix64(7919L * i + 0x85ebca6bL), P61)
      (a, b)
    }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5 of a byte range, digesting into a caller-held
    * 16-byte buffer — the per-gram hot path (winnowing hashes every
    * k-gram of every document): one ThreadLocal lookup and zero
    * allocations per call instead of three. */
  private def top60(
      md: java.security.MessageDigest, bytes: Array[Byte],
      off: Int, len: Int, out: Array[Byte]): Long = {
    md.update(bytes, off, len)
    md.digest(out, 0, 16) // implies reset
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (out(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Top 60 bits of md5 of the UTF-8 bytes — identical to parsing the
    * digest's first 15 hex digits, which is how DuckDB replays it:
    * `CAST(CONCAT('0x', SUBSTR(md5(s), 1, 15)) AS BIGINT)`. */
  def md5Top60(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val b = s.getBytes
    top60(md5Local.get(), b, 0, b.length, new Array[Byte](16))
  }

  /** All `depth` Count-Min bucket hashes of one item in a single call:
    * bucket_i = md5Top60(prefix_i ++ itemBytes) mod width, the item's
    * UTF-8 bytes rendered ONCE and each slot digested prefix-then-item
    * into a reused buffer. Value-identical to the per-slot
    * concat+md5+conv chain (md5 of the concatenation == md5 of the
    * two updates), which is what the DuckDB oracle replays. */
  def cmsBuckets(
      item: org.apache.spark.unsafe.types.UTF8String,
      prefixes: Array[Array[Byte]], width: Long): ArrayData = {
    val md = md5Local.get()
    val out = new Array[Byte](16)
    val b = item.getBytes
    val arr = new Array[Long](prefixes.length)
    var i = 0
    while (i < prefixes.length) {
      md.update(prefixes(i))
      arr(i) = top60(md, b, 0, b.length, out) % width
      i += 1
    }
    new GenericArrayData(arr)
  }

  /** Bloom-filter membership probe: test all `prefixes.length` bit
    * positions (position_i = md5Top60(prefix_i ++ itemBytes) mod
    * nBits — the SAME hash family as [[cmsBuckets]]: a Bloom filter
    * IS a depth-row CMS with 1-bit saturating counters) against a
    * packed little-endian word array, early-exiting on the first
    * clear bit. The common case at scale — a fact row whose key is
    * NOT in the dimension — pays ~1 digest, not `depth`. */
  def bloomContains(
      item: org.apache.spark.unsafe.types.UTF8String,
      prefixes: Array[Array[Byte]], nBits: Long, words: Array[Long]): Boolean = {
    val md = md5Local.get()
    val out = new Array[Byte](16)
    val b = item.getBytes
    var i = 0
    while (i < prefixes.length) {
      md.update(prefixes(i))
      val p = top60(md, b, 0, b.length, out) % nBits
      if ((words(p.toInt >>> 6) & (1L << (p & 63L).toInt)) == 0L) return false
      i += 1
    }
    true
  }

  /** Bloom bit position i of a LONG key: the SplitMix64 stream seeded
    * at splitMix64(v ^ splitMix64(seed)), taken mod nBits. ~1 ns per
    * position vs ~100 ns for the md5-family path — integral fact keys
    * (suppkey, partkey, user ids) are the common Bloom-prune case, and
    * the probe runs once per fact row at 100 TB. Shared by the build
    * (positions) and probe (contains) kernels so the two stay
    * definitionally locked. */
  def bloomPosLong(v: Long, i: Int, nBits: Long, seedMix: Long): Long =
    java.lang.Long.remainderUnsigned(splitMix64(splitMix64(v ^ seedMix) + i), nBits)

  /** All nHashes long-key Bloom positions (build side). */
  def bloomPositionsLong(v: Long, nHashes: Int, nBits: Long, seedMix: Long): ArrayData = {
    val arr = new Array[Long](nHashes)
    var i = 0
    while (i < nHashes) { arr(i) = bloomPosLong(v, i, nBits, seedMix); i += 1 }
    new GenericArrayData(arr)
  }

  /** Long-key Bloom membership probe with early exit (probe side). */
  def bloomContainsLong(
      v: Long, nHashes: Int, nBits: Long, seedMix: Long, words: Array[Long]): Boolean = {
    var i = 0
    while (i < nHashes) {
      val p = bloomPosLong(v, i, nBits, seedMix)
      if ((words(p.toInt >>> 6) & (1L << (p & 63L).toInt)) == 0L) return false
      i += 1
    }
    true
  }

  /** (a·h + b) mod 2⁶¹−1 via a 128-bit product (multiplyHigh):
    * a·h = hi·2⁶⁴ + lo with 2⁶⁴ ≡ 8 and 2⁶¹ ≡ 1 (mod p). Inputs are
    * < 2⁶¹ so the signed high word equals the unsigned one. */
  def affineMod61(a: Long, h: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, h)
    val lo = a * h
    var r = (lo & P61) + (lo >>> 61) + (hi << 3)
    r = (r & P61) + (r >>> 61)
    if (r >= P61) r -= P61
    r += b
    if (r >= P61) r -= P61
    r
  }

  /** All `k` min-hashes in ONE pass over the shingle array: one
    * md5Top60 per shingle + k affine transforms (the xxhash64
    * predecessor re-hashed the full string k times AND had no SQL
    * image). Empty input → null signature. */
  def minHashes60(shingles: ArrayData, coefA: Array[Long], coefB: Array[Long]): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val k = coefA.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = md5Local.get()
    val out = new Array[Byte](16)
    var seen = false
    var j = 0
    while (j < n) {
      if (!shingles.isNullAt(j)) {
        seen = true
        val b = shingles.getUTF8String(j).getBytes
        val h = top60(md, b, 0, b.length, out)
        var i = 0
        while (i < k) {
          val v = affineMod61(coefA(i), h, coefB(i))
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (!seen) return null
    new GenericArrayData(mins)
  }

  /** Distinct word n-gram shingles in ONE pass — value-identical to
    * `array_distinct(filter(transform(words, i => concat_ws(" ",
    * slice(words, i+1, n))), s => size(split(s, " ")) === n))` over
    * `split(text, " ")`: the window join recovers exactly the sliced
    * elements (split products contain no spaces), so the size filter
    * is equivalent to "window fully inside the array", and
    * array_distinct keeps first occurrences. The HOF chain copies
    * O(words·n) elements per row through interpreted lambdas; this
    * builds each shingle once. */
  def wordShingles(text: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val words = text.toString.split(" ", -1) // Spark split(col, " ") = regex, limit -1
    val out = new java.util.LinkedHashSet[String]
    var i = 0
    while (i + n <= words.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out.add(sb.toString)
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) {
      arr(k) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      k += 1
    }
    new GenericArrayData(arr)
  }

  /** All word n-gram OCCURRENCES in order — the non-distinct variant
    * of wordShingles. LM counting needs occurrence counts; document
    * frequency (the distinct form) is the wrong statistic there. */
  def wordNgrams(text: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    val m = math.max(words.length - n + 1, 0)
    val arr = new Array[Any](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      arr(i) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(arr)
  }

  /** Non-overlapping left-to-right occurrence count of a literal
    * substring — value-identical to the portable
    * `(length(t) - length(replace(t, sub, ''))) / length(sub)` form
    * (replace removes exactly the occurrences this loop finds) without
    * materializing the replaced copy. */
  def substringCount(text: org.apache.spark.unsafe.types.UTF8String, sub: String): Long = {
    val s = text.toString
    val l = sub.length
    var from = 0
    var c = 0L
    var i = s.indexOf(sub, from)
    while (i >= 0) {
      c += 1
      from = i + l
      i = s.indexOf(sub, from)
    }
    c
  }

  /** Count of ASCII characters from `set` (boolean[128]) — equals
    * `length(t) - length(regexp_replace(t, '[class]', ''))` for an
    * ASCII character class (ASCII bytes never occur inside UTF-8
    * multi-byte sequences, so a byte scan is exact). */
  def charClassCount(text: org.apache.spark.unsafe.types.UTF8String, set: Array[Boolean]): Long = {
    val bytes = text.getBytes
    var i = 0
    var c = 0L
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 0 && set(b)) c += 1
      i += 1
    }
    c
  }

  /** BPE-ish token count in one pass — value-identical to
    * `aggregate(split(t, " "), 0L, (acc, w) =>
    * acc + greatest(ceil(length(w)/4.0), 1))`: per word
    * max(ceil(chars/4), 1) = max((chars+3)/4, 1) in integer math. */
  def bpeIshCount(text: org.apache.spark.unsafe.types.UTF8String): Long = {
    val words = text.toString.split(" ", -1)
    var acc = 0L
    var i = 0
    while (i < words.length) {
      val w = words(i)
      val cp = w.codePointCount(0, w.length) // Spark length() counts code points
      acc += math.max((cp + 3) / 4, 1)
      i += 1
    }
    acc
  }

  /** Winnowing fingerprints (MOSS) in ONE pass: gram hashes
    * md5Top60(substr(text, i, k)) for i = 1..max(len-k+1, 1) (substr
    * clamps at the end, so a short text yields one whole-text gram),
    * window minima over w consecutive gram hashes (the final window
    * set clamps to whatever remains), distinct in first-occurrence
    * order. md5 is the ORACLE mode: engine-portable gram hashes make
    * the fingerprint set SQL-replayable. The PRODUCTION mode
    * ([[rollingGramHashes]]) swaps the per-gram md5 for a rolling
    * Karp-Rabin polynomial — O(len) total instead of O(len·k) digest
    * rounds — at the cost of SQL replayability; the winnowing
    * guarantee is hash-agnostic (equal windows select equal-content
    * grams under ANY deterministic content hash), so only the
    * selection DETAIL differs, never the "shared span ≥ k+w−1 is
    * detected" recall floor (DedupSpec property tests). */
  /** Shared winnowing kernel: UTF-8 code-point starts table, per-gram
    * hashes (md5-top60 or rolling Karp-Rabin), and the window-minima
    * fingerprint set (insertion order = window order). md5 hashing
    * works on byte SLICES at code-point boundaries: a UTF-8
    * substring's bytes ARE the byte range between its code points'
    * offsets, so each gram hash equals md5Top60(substringSQL(i+1, k))
    * without allocating a UTF8String + byte copy per gram.
    * [[winnowing]] and [[winnowingGrams]] differ only in what they
    * emit from this kernel — keep selection fixes HERE so the
    * "grams ≡ hashes in the fingerprint set" contract (DedupSpec, the
    * SQL oracles) cannot drift one-sided. */
  private def winnowKernel(
      text: org.apache.spark.unsafe.types.UTF8String, k: Int, w: Int,
      rolling: Boolean = false):
      (Array[Byte], Array[Int], Array[Long], LongOrderedSet) = {
    val len = text.numChars()
    val nGrams = math.max(len - (k - 1), 1)
    val bytes = text.getBytes
    val starts = new Array[Int](len + 1)
    var ci = 0
    var bi = 0
    while (ci < len) {
      starts(ci) = bi
      val b = bytes(bi)
      bi += (if ((b & 0x80) == 0) 1
             else if ((b & 0xe0) == 0xc0) 2
             else if ((b & 0xf0) == 0xe0) 3
             else 4)
      ci += 1
    }
    starts(len) = bytes.length
    val grams =
      if (rolling) rollingGramHashes(bytes, starts, len, k)
      else {
        val out = new Array[Long](nGrams)
        val md = md5Local.get()
        val digestBuf = new Array[Byte](16)
        var i = 0
        while (i < nGrams) {
          val from = starts(i)
          val until = starts(math.min(i + k, len))
          out(i) = top60(md, bytes, from, until - from, digestBuf)
          i += 1
        }
        out
      }
    val lastStart = math.max(nGrams - w, 0)
    val minima = new LongOrderedSet(math.max(2 * nGrams / (w + 1), 8))
    var i = 0
    while (i <= lastStart) {
      var m = grams(i)
      var j = i + 1
      val end = math.min(i + w, nGrams)
      while (j < end) { if (grams(j) < m) m = grams(j); j += 1 }
      minima.add(m)
      i += 1
    }
    (bytes, starts, grams, minima)
  }

  /** Insertion-ordered open-addressing set of NONNEGATIVE longs (both
    * gram-hash modes emit 60-bit values) for the winnowing hot path:
    * the boxed LinkedHashSet[java.lang.Long] it replaces spent more
    * time boxing/hashing wrappers than the rolling kernel spends
    * hashing. -1 marks an empty slot; capacity doubles at 60% load. */
  private[functions] final class LongOrderedSet(initialCap: Int) {
    private var cap = Integer.highestOneBit(math.max(initialCap, 8) * 2 - 1) << 1
    private var table = new Array[Long](cap)
    java.util.Arrays.fill(table, -1L)
    private var order = new Array[Long](math.max(initialCap, 8))
    private var n = 0
    def size: Int = n
    def orderedAt(i: Int): Long = order(i)
    private def idx(v: Long): Int = {
      var z = v * -7046029254386353131L // Murmur3-style spread
      z ^= z >>> 32
      var i = (z & (cap - 1)).toInt
      while (table(i) != -1L && table(i) != v) i = (i + 1) & (cap - 1)
      i
    }
    def contains(v: Long): Boolean = table(idx(v)) == v
    def add(v: Long): Boolean = {
      val i = idx(v)
      if (table(i) == v) return false
      table(i) = v
      if (n == order.length) order = java.util.Arrays.copyOf(order, n * 2)
      order(n) = v
      n += 1
      if (n * 5 > cap * 3) { // grow at 60% load
        cap <<= 1
        table = new Array[Long](cap)
        java.util.Arrays.fill(table, -1L)
        var j = 0
        while (j < n) { table(idx(order(j))) = order(j); j += 1 }
      }
      true
    }
  }

  /** SplitMix64 finalizer narrowed to 60 bits — same domain as
    * [[top60]] so the two gram-hash modes are drop-in interchangeable
    * (nonnegative, signed comparison = unsigned comparison). */
  private def mix60(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) >>> 4
  }

  /** Odd multiplier of the rolling polynomial (invertible mod 2⁶⁴). */
  private val RollB = 0x9e3779b97f4a7c15L

  /** Rolling Karp-Rabin gram hashes over CODE POINTS: h(i) =
    * Σ_j cp(i+j)·B^(k−1−j) mod 2⁶⁴, rolled in O(1) per gram
    * (subtract cp(i)·B^(k−1), multiply by B, add cp(i+k)), finalized
    * through [[mix60]] because a raw polynomial's low bits are too
    * structured for minima selection. Hash of a gram is a pure
    * function of its code-point sequence = its substring content, so
    * winnowing's structural guarantee survives the swap. Total cost
    * O(len) — no digest rounds, no allocation beyond the cp table. */
  private def rollingGramHashes(
      bytes: Array[Byte], starts: Array[Int], len: Int, k: Int): Array[Long] = {
    val nGrams = math.max(len - (k - 1), 1)
    val grams = new Array[Long](nGrams)
    val cps = new Array[Int](len)
    var ci = 0
    while (ci < len) {
      val off = starts(ci)
      val b0 = bytes(off)
      cps(ci) =
        if ((b0 & 0x80) == 0) b0
        else if ((b0 & 0xe0) == 0xc0)
          ((b0 & 0x1f) << 6) | (bytes(off + 1) & 0x3f)
        else if ((b0 & 0xf0) == 0xe0)
          ((b0 & 0x0f) << 12) | ((bytes(off + 1) & 0x3f) << 6) | (bytes(off + 2) & 0x3f)
        else
          ((b0 & 0x07) << 18) | ((bytes(off + 1) & 0x3f) << 12) |
            ((bytes(off + 2) & 0x3f) << 6) | (bytes(off + 3) & 0x3f)
      ci += 1
    }
    val kk = math.min(k, len) // short text: ONE whole-text gram
    var h = 0L
    var j = 0
    while (j < kk) { h = h * RollB + cps(j); j += 1 }
    grams(0) = mix60(h)
    var bk = 1L // B^(k-1) for the leading-term removal
    j = 1
    while (j < kk) { bk *= RollB; j += 1 }
    var i = 1
    while (i < nGrams) { // nGrams > 1 implies len > k, so i+k-1 < len
      h = (h - cps(i - 1) * bk) * RollB + cps(i + k - 1)
      grams(i) = mix60(h)
      i += 1
    }
    grams
  }

  def winnowing(text: org.apache.spark.unsafe.types.UTF8String, k: Int, w: Int): ArrayData =
    winnowing(text, k, w, rolling = false)

  /** [[winnowing]] with the gram-hash mode explicit. In rolling mode
    * the fingerprint set doubles as the PRODUCTION span-join key set:
    * a gram is selected iff its hash is a window minimum, so the
    * distinct selected-gram HASH set IS the minima set — joining on
    * these 8-byte longs instead of the gram strings is the classic
    * MOSS fingerprint join (exact up to 60-bit collisions). */
  def winnowing(text: org.apache.spark.unsafe.types.UTF8String, k: Int, w: Int,
      rolling: Boolean): ArrayData = {
    val (_, _, _, minima) = winnowKernel(text, k, w, rolling)
    val arr = new Array[Any](minima.size)
    var p = 0
    while (p < arr.length) { arr(p) = minima.orderedAt(p); p += 1 }
    new GenericArrayData(arr)
  }

  /** [[winnowing]] selection, but returning the selected k-gram
    * SUBSTRINGS (distinct, first-occurrence order) instead of their
    * hashes. A gram is selected iff its hash is one of the document's
    * window minima — the position/tie-free restatement of winnowing
    * that an external SQL engine replays as a hash-set join, with no
    * argmin-within-window tie rule to mirror. The gram strings are
    * what [[graft.text.Dedup.sharedSpanPairs]] joins on: equal gram =
    * exact shared substring, so candidate = verified in one step. */
  def winnowingGrams(
      text: org.apache.spark.unsafe.types.UTF8String, k: Int, w: Int): ArrayData =
    winnowingGrams(text, k, w, rolling = false)

  /** [[winnowingGrams]] with the gram-hash mode explicit: `rolling =
    * true` is the production mode (rolling Karp-Rabin selection,
    * ~one multiply per gram instead of an md5 digest), `false` the
    * SQL-replayable oracle mode. Emitted values are SUBSTRINGS either
    * way — only which grams get selected differs. */
  def winnowingGrams(
      text: org.apache.spark.unsafe.types.UTF8String, k: Int, w: Int,
      rolling: Boolean): ArrayData = {
    val (bytes, starts, grams, minima) = winnowKernel(text, k, w, rolling)
    val len = starts.length - 1
    val out = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]
    var i = 0
    while (i < grams.length) {
      if (minima.contains(grams(i))) {
        val from = starts(i)
        val until = starts(math.min(i + k, len))
        out.add(org.apache.spark.unsafe.types.UTF8String.fromBytes(
          bytes, from, until - from))
      }
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = it.next(); p += 1 }
    new GenericArrayData(arr)
  }

  /** 60-bit SimHash in ONE pass over the token array: per token one
    * md5Top60, per bit a ±1 sign-sum, positives packed. 60 bits (not
    * 63) because the base hash carries md5's top 60 bits — exactly
    * what an external engine can parse from the hex digest, so the
    * packed value is SQL-replayable bit for bit. Null tokens are
    * skipped; empty array → 0. */
  def simHash60(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](60)
    val md = md5Local.get()
    val out = new Array[Byte](16)
    var j = 0
    while (j < n) {
      if (!tokens.isNullAt(j)) {
        val tb = tokens.getUTF8String(j).getBytes
        val h = top60(md, tb, 0, tb.length, out)
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var packed = 0L
    var b = 0
    while (b < 60) {
      if (counts(b) > 0) packed |= (1L << b)
      b += 1
    }
    packed
  }
}

/** One-pass minhash signature vector (array<long> of length
  * `numHashes`) — replaces `numHashes` CodegenFallback higher-order
  * chains (transform + array_min per slot, each materializing an
  * intermediate array per row) with a single static-call loop. Base
  * hash md5Top60 + universal slots mod 2⁶¹−1 (TextHash.slotCoefs) —
  * SQL-replayable. */
case class MinHashArray(child: Expression, numHashes: Int)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  @transient private lazy val coefA = TextHash.slotCoefs(numHashes).map(_._1)
  @transient private lazy val coefB = TextHash.slotCoefs(numHashes).map(_._2)

  override def nullSafeEval(in: Any): Any =
    TextHash.minHashes60(in.asInstanceOf[ArrayData], coefA, coefB)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhCoefA", coefA, "long[]")
    val bRef = ctx.addReferenceObj("mhCoefB", coefB, "long[]")
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.TextHash.minHashes60($a, $aRef, $bRef);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "minhash_array"
}

/** One-pass distinct word-shingling over a text column (n >= 2). */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with Serializable {
  require(n >= 2, "use array_distinct(split(...)) for 1-grams")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(in: Any): Any =
    TextHash.wordShingles(in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHash.wordShingles($a, $n);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "word_shingles"
}

/** Non-distinct n-gram occurrence list (LM counting). */
case class WordNgramsExpr(child: Expression, n: Int)
    extends UnaryExpression with Serializable {
  require(n >= 1, "n >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(in: Any): Any =
    TextHash.wordNgrams(in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHash.wordNgrams($a, $n);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "word_ngrams"
}

/** One-pass 60-bit SimHash over a token array — replaces 60
  * CodegenFallback aggregate() chains per row. */
case class SimHash60(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType

  override def nullSafeEval(in: Any): Any =
    TextHash.simHash60(in.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHash.simHash60($a);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "simhash60"
}

/** One-pass winnowing fingerprint set over a text column (md5 =
  * SQL-replayable oracle mode; rolling = production mode, whose
  * fingerprints double as the span-family join keys). */
case class WinnowingExpr(child: Expression, k: Int, w: Int,
    rolling: Boolean = false)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(in: Any): Any =
    TextHash.winnowing(
      in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w, rolling)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHash.winnowing($a, $k, $w, $rolling);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "winnowing_fingerprints"
}

/** Winnowing-selected k-gram substrings (distinct) over a text
  * column. `rolling = false` (oracle mode) selects via per-gram md5;
  * `rolling = true` (production mode) via the rolling Karp-Rabin
  * kernel — same structural recall guarantee, ~5-10× less CPU, no SQL
  * replay. */
case class WinnowingGramsExpr(child: Expression, k: Int, w: Int,
    rolling: Boolean = false)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(in: Any): Any =
    TextHash.winnowingGrams(
      in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w, rolling)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHash.winnowingGrams($a, $k, $w, $rolling);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "winnowing_grams"
}

/** Codegen'd literal-substring occurrence count. */
case class SubstringCountExpr(child: Expression, sub: String)
    extends UnaryExpression with Serializable {
  require(sub.nonEmpty, "empty search pattern")
  override def dataType: DataType = LongType
  override def nullSafeEval(in: Any): Any =
    TextHash.substringCount(in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], sub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val subRef = ctx.addReferenceObj("sub", sub, "java.lang.String")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHash.substringCount($a, $subRef);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "substring_count"
}

/** Codegen'd ASCII character-class count. */
case class CharClassCountExpr(child: Expression, chars: String)
    extends UnaryExpression with Serializable {
  require(chars.forall(_ < 128), "ASCII classes only (byte-scan exactness)")
  override def dataType: DataType = LongType
  @transient private lazy val set: Array[Boolean] = {
    val s = new Array[Boolean](128)
    chars.foreach(c => s(c) = true)
    s
  }
  override def nullSafeEval(in: Any): Any =
    TextHash.charClassCount(in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], set)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("charSet", set, "boolean[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHash.charClassCount($a, $setRef);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "char_class_count"
}

/** Codegen'd one-pass BPE-ish token count. */
case class BpeIshCountExpr(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def nullSafeEval(in: Any): Any =
    TextHash.bpeIshCount(in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHash.bpeIshCount($a);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "bpeish_count"
}

/** Top 60 bits of md5 of a string column — value-identical to
  * `conv(substring(md5(s), 1, 15), 16, 10).cast("long")` (the DuckDB
  * image `CAST(CONCAT('0x', SUBSTR(md5(s),1,15)) AS BIGINT)` is
  * unchanged), but ~4× cheaper per row: one ThreadLocal digest reused
  * across rows and a direct byte→long fold instead of Spark's
  * per-row DigestUtils instantiation + 32-char hex render + base-16
  * string re-parse. This is the registry's per-row hash workhorse
  * (CMS buckets, KMV, shuffle order, stratified draws, Box-Muller
  * seeds), so the chain cost is paid millions of times per scan. */
case class Md5Top60Expr(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def nullSafeEval(in: Any): Any =
    TextHash.md5Top60(in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHash.md5Top60($a);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "md5_top60"
}

/** The fused Count-Min bucket vector: array(bucket_0 … bucket_d-1)
  * where bucket_i = md5Top60("cms<seed>|<i>|" + item) mod width
  * (TextHash.cmsBuckets). One item-bytes render + d buffer-reusing
  * digests per row instead of d full builtin hash chains. */
case class CmsBucketsExpr(child: Expression, depth: Int, width: Int, seed: Long)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(depth)(i =>
      s"cms$seed|$i|".getBytes(java.nio.charset.StandardCharsets.UTF_8))
  override def nullSafeEval(in: Any): Any =
    TextHash.cmsBuckets(
      in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], prefixes, width.toLong)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("cmsPrefixes", prefixes, "byte[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHash.cmsBuckets($a, $pRef, ${width}L);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "cms_buckets"
}

/** Codegen'd Bloom membership probe against a driver-built packed bit
  * array (referenced object, NOT a plan literal — a 2²⁰-bit filter is
  * 16 KiB of words that would otherwise bloat every serialized plan
  * fragment). Bit positions share [[CmsBucketsExpr]]'s hash family
  * ("cms<seed>|<i>|" prefixes), so the builder can derive positions
  * with the cmsBuckets column and the two stay definitionally locked.
  * Early-exits on the first clear bit (TextHash.bloomContains). */
case class BloomContainsExpr(
    child: Expression, nHashes: Int, nBits: Int, seed: Long, words: Array[Long])
    extends UnaryExpression with Serializable {
  require(nBits >= 64 && nBits % 64 == 0 && words.length == nBits / 64,
    s"bloom needs nBits a positive multiple of 64 matching words (got $nBits, ${words.length} words)")
  override def dataType: DataType = BooleanType
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(nHashes)(i =>
      s"cms$seed|$i|".getBytes(java.nio.charset.StandardCharsets.UTF_8))
  override def nullSafeEval(in: Any): Any =
    TextHash.bloomContains(
      in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      prefixes, nBits.toLong, words)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("bloomPrefixes", prefixes, "byte[][]")
    val wRef = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHash.bloomContains($a, $pRef, ${nBits}L, $wRef);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "bloom_contains"
}

/** Codegen'd long-key Bloom position vector (build side of the
  * integral-key fast path; formula: [[TextHash.bloomPosLong]]). */
case class BloomPositionsLongExpr(child: Expression, nHashes: Int, nBits: Int, seed: Long)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private val seedMix = TextHash.splitMix64(seed)
  override def nullSafeEval(in: Any): Any =
    TextHash.bloomPositionsLong(in.asInstanceOf[Long], nHashes, nBits.toLong, seedMix)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHash.bloomPositionsLong($a, $nHashes, ${nBits}L, ${seedMix}L);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "bloom_positions_long"
}

/** Codegen'd long-key Bloom membership probe — the integral-key twin
  * of [[BloomContainsExpr]]: SplitMix64 positions (~100× cheaper than
  * the md5 render-and-digest path), referenced word array, early exit. */
case class BloomContainsLongExpr(
    child: Expression, nHashes: Int, nBits: Int, seed: Long, words: Array[Long])
    extends UnaryExpression with Serializable {
  require(nBits >= 64 && nBits % 64 == 0 && words.length == nBits / 64,
    s"bloom needs nBits a positive multiple of 64 matching words (got $nBits, ${words.length} words)")
  override def dataType: DataType = BooleanType
  private val seedMix = TextHash.splitMix64(seed)
  override def nullSafeEval(in: Any): Any =
    TextHash.bloomContainsLong(
      in.asInstanceOf[Long], nHashes, nBits.toLong, seedMix, words)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHash.bloomContainsLong($a, $nHashes, ${nBits}L, ${seedMix}L, $wRef);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "bloom_contains_long"
}

object TextHashExpressions {
  /** Bloom membership probe column (codegen'd; see
    * [[BloomContainsExpr]]). */
  def bloomContains(
      item: Column, nHashes: Int, nBits: Int, seed: Long, words: Array[Long]): Column =
    Bridge.column(BloomContainsExpr(Bridge.expression(item), nHashes, nBits, seed, words))

  /** Long-key Bloom position vector (codegen'd). */
  def bloomPositionsLong(key: Column, nHashes: Int, nBits: Int, seed: Long): Column =
    Bridge.column(BloomPositionsLongExpr(Bridge.expression(key), nHashes, nBits, seed))

  /** Long-key Bloom membership probe (codegen'd, early exit). */
  def bloomContainsLong(
      key: Column, nHashes: Int, nBits: Int, seed: Long, words: Array[Long]): Column =
    Bridge.column(BloomContainsLongExpr(Bridge.expression(key), nHashes, nBits, seed, words))

  /** Minhash signature vector over a shingle array column. */
  def minHashArray(shingles: Column, numHashes: Int): Column =
    Bridge.column(MinHashArray(Bridge.expression(shingles), numHashes))

  /** Top-60-bits-of-md5 long hash of a string column (codegen'd; the
    * fast twin of the conv(substring(md5)) builtin chain). */
  def md5Top60(s: Column): Column =
    Bridge.column(Md5Top60Expr(Bridge.expression(s)))

  /** Fused Count-Min bucket vector for an item column (codegen'd). */
  def cmsBuckets(item: Column, depth: Int, width: Int, seed: Long): Column =
    Bridge.column(CmsBucketsExpr(Bridge.expression(item), depth, width, seed))

  /** Literal-substring occurrence count (codegen'd). */
  def substringCount(text: Column, sub: String): Column =
    Bridge.column(SubstringCountExpr(Bridge.expression(text), sub))

  /** ASCII character-class count (codegen'd). */
  def charClassCount(text: Column, chars: String): Column =
    Bridge.column(CharClassCountExpr(Bridge.expression(text), chars))

  /** One-pass BPE-ish token count (codegen'd). */
  def bpeIshCount(text: Column): Column =
    Bridge.column(BpeIshCountExpr(Bridge.expression(text)))

  /** One-pass winnowing fingerprint set (codegen'd). `rolling` picks
    * the production Karp-Rabin kernel (fingerprints = span join keys)
    * over the SQL-replayable md5 one. */
  def winnowing(text: Column, k: Int, w: Int, rolling: Boolean = false): Column =
    Bridge.column(WinnowingExpr(Bridge.expression(text), k, w, rolling))

  /** Winnowing-selected k-gram substrings (codegen'd). `rolling`
    * picks the production Karp-Rabin kernel over the SQL-replayable
    * md5 one (see [[WinnowingGramsExpr]]). */
  def winnowingGrams(text: Column, k: Int, w: Int, rolling: Boolean = false): Column =
    Bridge.column(WinnowingGramsExpr(Bridge.expression(text), k, w, rolling))

  /** Distinct word n-gram shingles over a text column (codegen'd). */
  def wordShingles(text: Column, n: Int): Column =
    Bridge.column(WordShinglesExpr(Bridge.expression(text), n))
  def wordNgrams(text: Column, n: Int): Column =
    Bridge.column(WordNgramsExpr(Bridge.expression(text), n))

  /** 60-bit simhash over a token array column. */
  def simHash60(tokens: Column): Column =
    Bridge.column(SimHash60(Bridge.expression(tokens)))
}
