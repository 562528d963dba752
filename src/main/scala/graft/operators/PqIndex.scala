package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Product quantization (PQ) for embeddings — the compression layer of
  * billion-scale ANN (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011; the structure behind IVF-PQ): split each
  * vector into `m` subvectors, quantize each against its own `k`-entry
  * codebook, store m small codes instead of the vector.
  *
  * The Spark shape mirrors production PQ pipelines: codebooks are trained
  * DRIVER-SIDE on a small deterministic hash-sample (m·k·(dim/m) doubles —
  * kilobytes; training on a sample is the standard practice, and a local
  * Lloyd loop avoids m×iters Spark jobs), then broadcast into a NARROW
  * encode expression — the corpus is read once, shuffled never. Search is
  * asymmetric distance computation (ADC): per query a lookup table of
  * m·k partial distances, so scoring a candidate costs m table adds
  * instead of dim multiplies.
  */
object PqIndex {

  /** codebooks(j)(ci) = codeword ci of subspace j (each dim/m doubles). */
  type Codebooks = Array[Array[Array[Double]]]

  private def l2sq(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }

  /** Plain local Lloyd: deterministic init (first k distinct points of the
    * hash-ordered sample), empty clusters keep their previous centroid so
    * the codebook size never shrinks mid-training. When the sample holds
    * FEWER than k distinct subvectors (low-cardinality subspace — e.g. a
    * zero-padded prefix), the codebook is legitimately smaller than k;
    * every consumer indexes LUTs by per-subspace OFFSETS, never by a
    * uniform k stride, so ragged codebooks stay correct.
    */
  private[operators] def localKmeans(
      points: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    require(points.nonEmpty, "PQ training sample is empty")
    var cents = points.map(_.toSeq).distinct.take(k).map(_.toArray)
    for (_ <- 1 to iters) {
      val sums   = Array.fill(cents.length)(new Array[Double](points.head.length))
      val counts = new Array[Long](cents.length)
      points.foreach { p =>
        var best = 0
        var bestD = Double.MaxValue
        var i = 0
        while (i < cents.length) {
          val d = l2sq(p, cents(i))
          if (d < bestD) { bestD = d; best = i }
          i += 1
        }
        counts(best) += 1
        var j = 0
        while (j < p.length) { sums(best)(j) += p(j); j += 1 }
      }
      cents = cents.indices.map { i =>
        if (counts(i) == 0) cents(i)
        else sums(i).map(_ / counts(i))
      }.toArray
    }
    cents
  }

  /** Train m sub-codebooks on a deterministic hash-ordered sample of
    * `sampleSize` vectors (TakeOrderedAndProject — one corpus read, no
    * shuffle; same sampling idiom as [[IvfIndex.train]]).
    */
  def train(
      emb: DataFrame, m: Int, k: Int, iters: Int,
      sampleSize: Int = 2048): Codebooks =
    trainFromSample(
      sampleBy(emb, xxhash64(col("vec_id")), _.getLong(2), sampleSize),
      m, k, iters)

  /** Bit-replayable PQ training — q56b's half of the q39b-vs-q39
    * relationship: [[localKmeans]] is ALREADY deterministic given its
    * sample order (init = first-k-distinct in sample order, sums
    * accumulate point-by-point in sample order, one division per dim), so
    * the only non-SQL-replayable ingredient in [[train]] is the xxhash64
    * sample key, which DuckDB lacks. This twin keys the sample by the
    * repo's salted-md5 discipline instead; everything downstream —
    * [[localKmeans]], [[encode]], the ADC search — is shared verbatim,
    * and every float in the codebooks (hence the whole approximate ANN
    * answer) replays bit-exactly as sorted-list folds in DuckDB.
    */
  def trainDet(
      emb: DataFrame, m: Int, k: Int, iters: Int,
      sampleSize: Int = 2048): Codebooks =
    trainFromSample(
      sampleBy(
        emb, md5(concat(col("vec_id").cast("string"), lit(":pqseed"))),
        _.getString(2), sampleSize),
      m, k, iters)

  /** The `sampleSize` vectors with the smallest (key, vec_id), in that
    * order. The orderBy+limit plans as TakeOrderedAndProject (per-partition
    * top-N, driver merge — no shuffle); the driver-side re-sort pins the
    * COLLECTED order to the same key rather than trusting the plan to
    * deliver rows sorted, because [[localKmeans]]'s float sums depend on
    * iteration order.
    */
  private def sampleBy[K: Ordering](
      emb: DataFrame, key: Column, getKey: org.apache.spark.sql.Row => K,
      sampleSize: Int): Array[Array[Double]] =
    emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        key.as("k"))
      .orderBy(col("k").asc, col("vec_id").asc)
      .limit(sampleSize)
      .collect()
      .sortBy(r => (getKey(r), r.getLong(0)))
      .map(_.getSeq[Double](1).toArray)

  private def trainFromSample(
      sample: Array[Array[Double]], m: Int, k: Int, iters: Int): Codebooks = {
    require(sample.nonEmpty, "PQ training sample is empty (empty corpus?)")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val ds = dim / m
    Array.tabulate(m) { j =>
      localKmeans(sample.map(_.slice(j * ds, (j + 1) * ds)), k, iters)
    }
  }

  /** vec_id → array<int> of m codes. One narrow pass over the corpus via
    * the [[PqEncode]] kernel — a Column-algebra formulation (m×k
    * `slice`+dot structs) is semantically identical but generates a
    * 256-branch expression tree whose codegen compile time and per-row
    * allocation dominated the whole query (measured 5.1s → 0.6s at sf0.1).
    */
  def encode(emb: DataFrame, books: Codebooks): DataFrame =
    emb.select(col("vec_id"),
      Bridge.column(PqEncode(
        Bridge.expression(col("embedding").cast("array<double>")), books))
        .as("codes"))

  /** ADC lookup table for one query column, flattened to Σ_j k_j doubles:
    * entry offset_j+ci = ‖q_j‖²-invariant partial = ‖c‖² − 2·q_j·c, so
    * dist(q, x) ≈ Σ_j lut[offset_j + codes_j] ranks exactly like the
    * quantized L2 distance. Offsets (not a uniform k stride) keep ragged
    * codebooks — a subspace with < k distinct training subvectors — exact.
    */
  private def lutCol(qe: Column, books: Codebooks): Column =
    Bridge.column(PqLut(Bridge.expression(qe), books))

  /** Per-subspace start offsets into the flattened LUT. */
  private def lutOffsets(books: Codebooks): Seq[Int] =
    books.scanLeft(0)(_ + _.length).init.toSeq

  /** Shared ADC scoring + top-k: input carries (vec_id, codes, q_id, lut);
    * scoring one candidate is m lookups + adds, then the per-query top-k.
    * One place owns the offset indexing and the tie rule for both the flat
    * [[knn]] and the cluster-pruned [[knnIvfPq]].
    */
  private def adcTopK(
      withLut: DataFrame, books: Codebooks, topK: Int): DataFrame = {
    val offsets = typedlit(lutOffsets(books))
    val scored = withLut
      .filter(col("vec_id") =!= col("q_id"))
      .select(
        col("q_id"), col("vec_id").as("neighbor_id"),
        aggregate(
          zip_with(col("codes"), offsets,
            (c, off) => element_at(col("lut"), off + c + 1)),
          lit(0.0), (acc, x) => acc + x).as("adc_dist"))
    RelationalOps.topKPerGroup(
        scored, Seq("q_id"), Seq(col("adc_dist").asc, col("neighbor_id").asc),
        topK, rankCol = "rnk")
  }

  /** Approximate top-k by ADC: the (small) query set carries its LUT and is
    * broadcast against the coded corpus; scoring one candidate is m array
    * lookups + adds — no full-vector math touches the corpus at query time.
    */
  def knn(
      codes: DataFrame, queries: DataFrame, books: Codebooks,
      topK: Int): DataFrame = {
    val q = queries.select(col("q_id"),
      lutCol(col("qe").cast("array<double>"), books).as("lut"))
    adcTopK(codes.crossJoin(broadcast(q)), books, topK)
  }

  /** IVF-PQ — the canonical billion-scale ANN layout (coarse quantizer
    * prunes WHICH vectors to score, product quantizer prunes HOW MUCH each
    * costs): the corpus is read ONCE, emitting (cluster_id, codes) in a
    * single narrow projection; a query then joins only its `nprobe`
    * clusters and pays m adds per candidate. At 100 TB with the corpus
    * bucketed by cluster_id this is a partition-pruned scan of ~nprobe/k
    * of the data per query batch.
    */
  def knnIvfPq(
      emb: DataFrame, centroids: DataFrame, queries: DataFrame,
      books: Codebooks, topK: Int, nprobe: Int): DataFrame = {
    val coded = emb.select(
      col("vec_id"),
      Bridge.column(PqEncode(
        Bridge.expression(col("embedding").cast("array<double>")), books))
        .as("codes"),
      IvfIndex.nearestClusterCol(col("embedding"), centroids).as("cluster_id"))
    val q = queries.select(
      col("q_id"),
      lutCol(col("qe").cast("array<double>"), books).as("lut"),
      explode(IvfIndex.probeClustersCol(col("qe"), centroids, nprobe))
        .as("cluster_id"))
    adcTopK(coded.join(broadcast(q), Seq("cluster_id")), books, topK)
  }
}

/** `pq_encode(v)`: argmin codeword per subspace, one tight loop (see
  * [[PqIndex.encode]] for why this is a kernel and not Column algebra).
  * Ties go to the lower code (strict `<` keeps the first minimum).
  */
case class PqEncode(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  // analysis-time rejection of a mistyped column (the callers cast to
  // array<double> explicitly; a bad caller must fail at planning, not as
  // a runtime CCE / janino error inside the encode stage)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<double>, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    PqKernels.encode(v.asInstanceOf[ArrayData], books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.operators.PqKernels.encode($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `pq_lut(qe)`: flattened m·k ADC table of ‖c‖² − 2·q_j·c partials. */
case class PqLut(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_lut"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<double>, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    PqKernels.lut(v.asInstanceOf[ArrayData], books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.operators.PqKernels.lut($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

object PqKernels {

  private def checkDims(v: ArrayData, books: Array[Array[Array[Double]]]): Int = {
    val ds = books(0)(0).length
    val expect = books.length * ds
    if (v.numElements() != expect) throw new IllegalArgumentException(
      s"pq kernel: vector has ${v.numElements()} dims, codebooks expect $expect")
    ds
  }

  def encode(v: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val ds  = checkDims(v, books)
    val out = new Array[Int](books.length)
    var j = 0
    while (j < books.length) {
      val book = books(j)
      var best      = 0
      var bestScore = Double.MaxValue
      var ci = 0
      while (ci < book.length) {
        val c   = book(ci)
        var dot = 0.0
        var cn  = 0.0
        var t   = 0
        while (t < ds) {
          val cv = c(t)
          dot += v.getDouble(j * ds + t) * cv
          cn  += cv * cv
          t   += 1
        }
        val score = cn - 2.0 * dot
        if (score < bestScore) { bestScore = score; best = ci }
        ci += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  // Offset-indexed (ragged-safe): subspace j's block starts at Σ_{i<j} k_i,
  // matching PqIndex.lutOffsets — a uniform books(0).length stride would
  // corrupt or overrun the table when codebook sizes differ.
  def lut(qe: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val ds  = checkDims(qe, books)
    val out = new Array[Double](books.map(_.length).sum)
    var off = 0
    var j = 0
    while (j < books.length) {
      val book = books(j)
      var ci = 0
      while (ci < book.length) {
        val c   = book(ci)
        var dot = 0.0
        var cn  = 0.0
        var t   = 0
        while (t < ds) {
          val cv = c(t)
          dot += qe.getDouble(j * ds + t) * cv
          cn  += cv * cv
          t   += 1
        }
        out(off + ci) = cn - 2.0 * dot
        ci += 1
      }
      off += book.length
      j += 1
    }
    new GenericArrayData(out)
  }
}
