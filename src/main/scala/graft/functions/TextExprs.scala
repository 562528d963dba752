package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for the custom expressions below. Called both from
  * interpreted `eval` and from generated code (a single static call per row
  * keeps the operator inside WholeStageCodegen — preferred over a Scala UDF,
  * which would box through `AnyRef` and break codegen).
  *
  * Hash family: both fingerprints derive their 64-bit unit hashes from md5
  * (first 8 digest bytes, big-endian — i.e. the first 16 hex chars), the
  * same family as the q21 MinHash signatures. A seeded xxhash64 is ~3×
  * faster per byte, but md5 is what DuckDB exposes, which makes BOTH
  * fingerprints bit-replayable by the SQL oracle — the whole approximate
  * dedup surface stays hash-checked, not rows-only. The hash quality
  * requirement here (uniform bits over short strings) is met by either.
  */
object TextKernels {

  // MessageDigest is stateful and not thread-safe; one per executor thread.
  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  // reused 16-byte output buffer for md5Hash64 (same discipline as winnow
  // and cdcCuts, whose comments measured per-gram digest allocation as the
  // dominant cost) — safe because each executor thread has its own
  private val digestLocal = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  /** First 8 bytes of md5(s) as a big-endian long — numerically equal to
    * parsing the first 16 hex chars of the digest (the DuckDB oracle's
    * `substr(md5(s), 1, 16)`). Digest lands in a thread-local buffer and
    * the long is assembled manually: simhash calls this once per token per
    * document corpus-wide, and the previous `ByteBuffer.wrap(md.digest(...))`
    * allocated two objects per call on that hot path.
    */
  def md5Hash64(s: UTF8String): Long = {
    val md  = md5Local.get()
    val buf = digestLocal.get()
    val bytes = s.getBytes
    md.reset()
    md.update(bytes, 0, bytes.length)
    md.digest(buf, 0, 16)
    ((buf(0) & 0xffL) << 56) | ((buf(1) & 0xffL) << 48) |
      ((buf(2) & 0xffL) << 40) | ((buf(3) & 0xffL) << 32) |
      ((buf(4) & 0xffL) << 24) | ((buf(5) & 0xffL) << 16) |
      ((buf(6) & 0xffL) << 8) | (buf(7) & 0xffL)
  }

  /** 64-bit SimHash over an array of tokens: each token votes its md5-derived
    * hash bits up/down; the sign of each bit's tally forms the fingerprint.
    * Near-duplicate texts land within small Hamming distance.
    */
  def simhash(tokens: ArrayData): Long = {
    val n   = tokens.numElements()
    val acc = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = md5Hash64(tokens.getUTF8String(i))
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var r = 0L
    var j = 0
    while (j < 64) { if (acc(j) > 0) r |= 1L << j; j += 1 }
    r
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Content-defined-chunking cut positions (the q63 predicate): 1-based
    * CHARACTER positions i in [2, nChars-k+1] whose k-gram's md5 has hex
    * char 16 equal to '0' — i.e. digest byte 7's low nibble is zero —
    * identical to the DuckDB oracle's
    * `substr(md5(substr(norm, i, k)), 16, 1) = '0'` replay. Same
    * one-getBytes / shared-digest byte-slice discipline as [[winnow]]: the
    * equivalent Column form (`filter(sequence(2, m), i => md5(substr...))`)
    * evaluates the lambda INTERPRETED per position with a fresh digest +
    * UTF8String allocation each — ~1000× slower on a real corpus (1165 s
    * vs ~0.6 s at sf0.1, measured round 6).
    */
  def cdcCuts(text: UTF8String, k: Int): ArrayData = {
    val nChars = text.numChars()
    val m = nChars - k + 1 // last valid 1-based gram start
    if (m < 2) return new GenericArrayData(Array.empty[Any])
    val bytes = text.getBytes
    val offsets = new Array[Int](nChars + 1) // code point i starts at offsets(i)
    var ci = 0
    var bi = 0
    while (ci < nChars) {
      offsets(ci) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      ci += 1
    }
    offsets(nChars) = bytes.length
    val md     = md5Local.get()
    val digest = new Array[Byte](16)
    val cuts   = new java.util.ArrayList[Any]()
    var i = 1 // 0-based gram start; emitted 1-based position i+1 ∈ [2, m]
    while (i < m) {
      md.reset()
      md.update(bytes, offsets(i), offsets(i + k) - offsets(i))
      md.digest(digest, 0, 16)
      if ((digest(7) & 0x0f) == 0) cuts.add(i + 1)
      i += 1
    }
    new GenericArrayData(cuts.toArray)
  }

  /** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    * hash every k-gram (CODE POINTS, so the SQL oracle's character-based
    * `substr` sees identical grams on non-ASCII text), slide a window of
    * size w keeping each window's minimum (unsigned order, rightmost
    * minimum on ties), emit the distinct minima sorted ascending unsigned,
    * formatted as 16-char lowercase hex — lexicographic order on that fixed
    * width equals unsigned numeric order, so the oracle can sort/min on the
    * strings directly. Robust to local edits; output size ~ len/w.
    */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val nChars = text.numChars()
    val m = nChars - k + 1
    if (m < 1) return new GenericArrayData(Array.empty[Any])
    // Hash each k-gram straight out of the text's UTF-8 bytes via a sliding
    // code-point offset table — one getBytes, one MessageDigest.update per
    // gram over a shared slice, one reused 16-byte digest buffer. The
    // obvious substringSQL(i+1, k) form allocates a UTF8String + byte[] +
    // digest array PER GRAM (m allocations per row — measurable on long
    // documents). Hashes identical bytes, so the DuckDB oracle's
    // char-based substr replay is unaffected.
    val bytes = text.getBytes
    val offsets = new Array[Int](nChars + 1) // code point i starts at offsets(i)
    var ci = 0
    var bi = 0
    while (ci < nChars) {
      offsets(ci) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      ci += 1
    }
    offsets(nChars) = bytes.length
    val md     = md5Local.get()
    val digest = new Array[Byte](16)
    val hashes = new Array[Long](m)
    var i = 0
    while (i < m) {
      md.reset()
      md.update(bytes, offsets(i), offsets(i + k) - offsets(i))
      md.digest(digest, 0, 16)
      hashes(i) =
        ((digest(0) & 0xffL) << 56) | ((digest(1) & 0xffL) << 48) |
        ((digest(2) & 0xffL) << 40) | ((digest(3) & 0xffL) << 32) |
        ((digest(4) & 0xffL) << 24) | ((digest(5) & 0xffL) << 16) |
        ((digest(6) & 0xffL) << 8) | (digest(7) & 0xffL)
      i += 1
    }
    val out = new java.util.TreeSet[java.lang.Long](
      new java.util.Comparator[java.lang.Long] {
        override def compare(a: java.lang.Long, b: java.lang.Long): Int =
          java.lang.Long.compareUnsigned(a, b)
      })
    if (m <= w) {
      var min = hashes(0); i = 1
      while (i < m) {
        if (java.lang.Long.compareUnsigned(hashes(i), min) <= 0) min = hashes(i)
        i += 1
      }
      out.add(min)
    } else {
      // monotone deque of indices, O(m)
      val deque = new Array[Int](m)
      var head = 0; var tail = 0 // [head, tail)
      i = 0
      while (i < m) {
        while (tail > head &&
            java.lang.Long.compareUnsigned(hashes(deque(tail - 1)), hashes(i)) >= 0)
          tail -= 1
        deque(tail) = i; tail += 1
        if (deque(head) <= i - w) head += 1
        if (i >= w - 1) out.add(hashes(deque(head)))
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it  = out.iterator()
    i = 0
    while (it.hasNext) {
      arr(i) = UTF8String.fromString(f"${it.next().longValue()}%016x")
      i += 1
    }
    new GenericArrayData(arr)
  }

  /** q70/q74 gram-repetition statistics, native: word n-grams WITH
    * multiplicity built from the token array (space-joined, the
    * wordGramsWithRepeats convention incl. the shorter-than-n whole-doc
    * degenerate gram), sorted binary (= `array_sort` string order), then
    * one run walk. Returns (top_count, top_gram, dup_chars, total_chars) —
    * field-for-field the fold accumulator of [[TextOps.gramRunStats]],
    * whose HOF form evaluates its lambda INTERPRETED with a fresh struct
    * per element (q74 runs seven of these folds per row: 4.3 s at sf0.1 on
    * the HOF path). Tie-break matches the fold exactly: ascending walk,
    * strictly-greater displacement → lexicographically smallest gram among
    * the max-count ones. Char counts are code points (`numChars`), the
    * `length()` the oracle replays.
    */
  def gramRunStats(tokens: ArrayData, n: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val m0 = tokens.numElements()
    val m  = math.max(m0 - n + 1, 1)
    val toks = new Array[UTF8String](m0)
    var i = 0
    while (i < m0) { toks(i) = tokens.getUTF8String(i); i += 1 }
    val space = UTF8String.fromString(" ")
    val grams = new Array[UTF8String](m)
    i = 0
    while (i < m) {
      val cnt = math.min(n, m0 - i)
      val parts = new Array[UTF8String](math.max(cnt, 0))
      var j = 0
      while (j < cnt) { parts(j) = toks(i + j); j += 1 }
      grams(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    java.util.Arrays.sort(grams, null) // Comparable: binary UTF8 order
    var topCount = 0L
    var topGram: UTF8String = UTF8String.EMPTY_UTF8
    var dupChars = 0L
    var totalChars = 0L
    var run = 0L
    var prev: UTF8String = null
    i = 0
    while (i < m) {
      val g = grams(i)
      val len = g.numChars().toLong
      run = if (prev != null && g.equals(prev)) run + 1 else 1L
      if (run > topCount) { topCount = run; topGram = g }
      if (run == 2L) dupChars += len * 2L
      else if (run > 2L) dupChars += len
      totalChars += len
      prev = g
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](topCount, topGram, dupChars, totalChars))
  }
}

/** Analysis-time input checks shared by the kernel expressions: a
  * wrong-typed column must fail with a named TypeCheckFailure when the
  * plan is analyzed, not as a runtime ClassCastException (interpreted
  * path) or an unrelated-looking janino compile error (codegen path)
  * deep inside a running job.
  */
private[functions] object KernelTypeChecks {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  def stringArray(name: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name expects array<string> tokens, got $other")
  }

  def string(name: String, dt: DataType): TypeCheckResult = dt match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name expects a string column, got $other")
  }
}

/** `simhash64(tokens)`: native Catalyst expression, codegen'd as one static
  * call per row.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypeChecks.stringArray(prettyName, child.dataType)

  override def nullSafeEval(input: Any): Any =
    TextKernels.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `winnow_fingerprint(text, k, w)`: winnowing fingerprint as a sorted
  * array<string> of 16-char lowercase hex hashes (lexicographic order on the
  * fixed width equals unsigned numeric order on the underlying 64-bit hash).
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k > 0 && w > 0, "k and w must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprint"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypeChecks.string(prettyName, child.dataType)

  override def nullSafeEval(input: Any): Any =
    TextKernels.winnow(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.winnow($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

/** `cdc_cuts(text, k)`: content-defined-chunking cut positions as a
  * codegen'd expression — one static kernel call per row.
  */
case class CdcCuts(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "k must be positive")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_cuts"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypeChecks.string(prettyName, child.dataType)

  override def nullSafeEval(input: Any): Any =
    TextKernels.cdcCuts(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.cdcCuts($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)
}

/** `gram_run_stats(tokens, n)`: the q70/q74 sorted-runs repetition
  * statistics as one codegen'd static call per row — same output struct as
  * the [[TextOps.gramRunStats]] fold (its reference twin, equivalence
  * spec-asserted in GramRunStatsKernelSpec), ~7× faster on the q74
  * seven-fold profile.
  */
case class GramRunStats(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "n must be positive")
  override def dataType: DataType = StructType(Seq(
    StructField("top_count", LongType, nullable = false),
    StructField("top_gram", StringType, nullable = false),
    StructField("dup_chars", LongType, nullable = false),
    StructField("total_chars", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gram_run_stats"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypeChecks.stringArray(prettyName, child.dataType)

  override def nullSafeEval(input: Any): Any =
    TextKernels.gramRunStats(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.gramRunStats($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): GramRunStats =
    copy(child = newChild)
}

/** Column-level entry points for the custom expressions. */
object TextFingerprints {
  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))

  /** Native q70/q74 repetition statistics over a TOKEN array (the gram
    * construction happens inside the kernel).
    */
  def gramRunStats(tokens: Column, n: Int): Column =
    Bridge.column(GramRunStats(Bridge.expression(tokens), n))

  def winnowFingerprint(text: Column, k: Int = 8, w: Int = 16): Column =
    Bridge.column(WinnowFingerprint(Bridge.expression(text), k, w))

  def cdcCuts(text: Column, k: Int = 8): Column =
    Bridge.column(CdcCuts(Bridge.expression(text), k))
}
