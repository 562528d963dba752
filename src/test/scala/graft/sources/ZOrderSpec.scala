package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Semantics of the Z-order layout ([[ZOrderLayout]]): the Morton
  * interleave against a bit-level reference, Spark/SQL generator
  * agreement by construction, and the property the layout exists for —
  * files clustered on the curve have narrow min/max spans on BOTH
  * dimensions, where a linear sort is narrow on one and full-width on the
  * other.
  */
class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  /** Bit-at-a-time reference interleave. */
  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | ((x >> i & 1L) << (2 * i)) | ((y >> i & 1L) << (2 * i + 1))
    }

  test("mortonKey matches the bit-level reference on known and random values") {
    val cases = Seq((0L, 0L), (3L, 1L), (1L, 3L), (65535L, 0L), (0L, 65535L),
      (12345L, 54321L), (65535L, 65535L)) ++
      (1 to 50).map(i => ((i * 2654435761L) % 65536, (i * 40503L) % 65536))
    val out = cases.toDF("x", "y")
      .withColumn("z", ZOrderLayout.mortonKey(col("x"), col("y")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (x, y) =>
      assert(out((x, y)) === mortonRef(x, y, 16), s"($x, $y)")
    }
  }

  test("morton(x=3,y=1) interleaves to 0b0111 — x even bits, y odd bits") {
    val z = Seq((3L, 1L)).toDF("x", "y")
      .select(ZOrderLayout.mortonKey(col("x"), col("y"))).head().getLong(0)
    assert(z === 7L)
  }

  /** Per-file (max - min) spans of `c`, via the file each row landed in. */
  private def fileSpans(path: String, c: String): Seq[Long] =
    spark.read.parquet(path)
      .groupBy(input_file_name())
      .agg((max(col(c)) - min(col(c))).as("span"))
      .collect().map(_.getAs[Long]("span")).toSeq

  test("z-ordered files are narrow on BOTH dims; a linear sort is not") {
    // 64×64 grid, one row per cell — both dims uniform and independent
    val dir = Files.createTempDirectory("graft-zorder").toString
    val grid = spark.range(4096)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))

    ZOrderLayout.writeZOrdered(grid, col("x"), col("y"), s"$dir/z",
      numFiles = 16, bits = 6)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$dir/linear")

    def avg(s: Seq[Long]) = s.sum.toDouble / s.size
    // 16 files over a 6-bit curve → each file ≈ a 16×16 tile: spans ~16 of
    // 63 on both dims. The linear sort nails x (span ~3) but every file
    // spans all of y.
    assert(avg(fileSpans(s"$dir/z", "x")) < 32.0)
    assert(avg(fileSpans(s"$dir/z", "y")) < 32.0)
    assert(avg(fileSpans(s"$dir/linear", "y")) > 55.0)
    // row preservation under the rewrite
    assert(spark.read.parquet(s"$dir/z").count() === 4096L)
  }

  test("registry q82: zkey equals mortonKey of the wrapped dims on sf data") {
    val q = graft.SparkEntry.queries("q82_zorder_key")(
      spark, "/root/testdata/sf0.001")
    val bad = q.withColumn("expect",
        ZOrderLayout.mortonKey(pmod(col("user_id"), lit(65536L)),
          pmod(col("t_bucket"), lit(65536L))))
      .filter(!(col("zkey") <=> col("expect"))) // null-safe: NULL ≠ pass
    assert(bad.count() === 0L)
    assert(q.count() > 0L)
  }
}
