package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for the custom expressions below. Called both from
  * interpreted `eval` and from generated code (a single static call per row
  * keeps the operator inside WholeStageCodegen — preferred over a Scala UDF,
  * which would box through `AnyRef` and break codegen).
  */
object TextKernels {
  private final val Seed = 42L

  def hashUtf8(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  /** 64-bit SimHash over an array of tokens: each token votes its xxhash64
    * bits up/down; the sign of each bit's tally forms the fingerprint.
    * Near-duplicate texts land within small Hamming distance.
    */
  def simhash(tokens: ArrayData): Long = {
    val n   = tokens.numElements()
    val acc = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hashUtf8(tokens.getUTF8String(i), Seed)
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

  /** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    * hash every k-gram (bytes), slide a window of size w keeping each
    * window's minimum (rightmost minimum on ties), emit the distinct minima
    * sorted. Robust to local edits; output size ~ len/w.
    */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val n     = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val m      = n - k + 1
    val hashes = new Array[Long](m)
    var i = 0
    while (i < m) {
      hashes(i) = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + i, k, Seed)
      i += 1
    }
    val out = new java.util.TreeSet[java.lang.Long]()
    if (m <= w) {
      var min = hashes(0); i = 1
      while (i < m) { if (hashes(i) <= min) min = hashes(i); i += 1 }
      out.add(min)
    } else {
      // monotone deque of indices, O(m)
      val deque = new Array[Int](m)
      var head = 0; var tail = 0 // [head, tail)
      i = 0
      while (i < m) {
        while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
        deque(tail) = i; tail += 1
        if (deque(head) <= i - w) head += 1
        if (i >= w - 1) out.add(hashes(deque(head)))
        i += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it  = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }
}

/** `simhash64(tokens)`: native Catalyst expression, codegen'd as one static
  * call per row.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    TextKernels.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `winnow_fingerprint(text, k, w)`: winnowing fingerprint as sorted
  * array<bigint> of selected k-gram hashes.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k > 0 && w > 0, "k and w must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprint"

  override def nullSafeEval(input: Any): Any =
    TextKernels.winnow(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.winnow($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

/** Column-level entry points for the custom expressions. */
object TextFingerprints {
  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))

  def winnowFingerprint(text: Column, k: Int = 8, w: Int = 16): Column =
    Bridge.column(WinnowFingerprint(Bridge.expression(text), k, w))
}
