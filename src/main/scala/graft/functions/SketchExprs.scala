package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(col)` over a pre-built [[BloomFilter]]: the probe
  * side of a semi-join pushed down into the scan's codegen'd filter.
  *
  * The filter ships as its SERIALIZED bytes (what the expression tree
  * carries through plan serialization) and is deserialized once per
  * codegen'd operator instance via a mutable-state slot — the hot path is
  * one `mightContainBinary` over the value's raw UTF-8 bytes, no String
  * allocation, fully inside WholeStageCodegen. Build and probe both hash
  * the raw bytes ([[SketchOps.buildStringBloom]] uses `putBinary` on the
  * same encoding), so the pair is symmetric by construction.
  *
  * False positives pass (the exact operator behind the prefilter decides);
  * false negatives cannot happen — which is what makes this safe as a
  * PREFILTER that never changes results, only data volume.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a string column, got $other")
    }

  @transient private lazy val bf: BloomFilter = BloomFilter.readFrom(bloomBytes)

  override def nullSafeEval(input: Any): Any =
    bf.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytesRef = ctx.addReferenceObj("bloomBytes", bloomBytes, "byte[]")
    val bfClass = classOf[BloomFilter].getName
    val bfVar = ctx.addMutableState(bfClass, "bloomFilter",
      v => s"""try { $v = $bfClass.readFrom($bytesRef); }
              |catch (java.io.IOException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    defineCodeGen(ctx, ev, c => s"$bfVar.mightContainBinary($c.getBytes())")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object SketchOps {

  /** Distributed build of a string bloom filter over ONE column of `df`:
    * per-partition `putBinary` folds (raw UTF-8 bytes — the encoding the
    * probe expression hashes), merged pairwise on the driver. Returns the
    * serialized filter. `expectedItems` sizes the bit array for the target
    * false-positive rate; at 1% fpp the filter is ~1.2 bytes per item — a
    * million-gram eval set is ~1.2 MB, small enough to ride along with the
    * serialized plan.
    */
  def buildStringBloom(
      df: org.apache.spark.sql.DataFrame, column: String,
      expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    val rdd = df.select(column).na.drop()
      .queryExecution.toRdd // InternalRow: UTF8String, no row decode
      .mapPartitions { it =>
        val f = BloomFilter.create(math.max(expectedItems, 64L), fpp)
        it.foreach(r => f.putBinary(r.getUTF8String(0).getBytes))
        Iterator.single(f)
      }
    // an optimized-to-empty source plans ZERO partitions, where reduce
    // throws "empty collection" — degrade to the empty filter ("nothing
    // might be contained") instead of killing the prefilter build
    val bf =
      if (rdd.getNumPartitions == 0) BloomFilter.create(math.max(expectedItems, 64L), fpp)
      else rdd.reduce { (a, b) => a.mergeInPlace(b); a }
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** The probe as a user-facing Column (true ⇒ possibly present). */
  def bloomMightContain(c: Column, bloomBytes: Array[Byte]): Column =
    Bridge.column(BloomMightContain(Bridge.expression(c), bloomBytes))
}
