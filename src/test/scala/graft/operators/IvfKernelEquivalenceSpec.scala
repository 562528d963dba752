package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** The round-15 IVF kernels ([[NearestCentroid]]/[[ProbeClusters]]) must be
  * BIT-IDENTICAL to the Column-algebra reference twins they replaced
  * (nearestColViaStructs / probeClustersViaStructs): same left-to-right
  * float accumulation, same (score asc, cid asc) tie rule, same
  * float/double child handling. The kernels exist for plan stability (the
  * codebook rides `addReferenceObj`, so Lloyd iterations stop recompiling
  * codegen) — never for different numbers.
  */
class IvfKernelEquivalenceSpec extends SparkSpec {

  private def codebook(seed: Int, k: Int, dim: Int): Array[(Int, Array[Double])] = {
    val rnd = new scala.util.Random(seed)
    Array.tabulate(k)(i => (i, Array.fill(dim)(rnd.nextGaussian())))
  }

  private def kernelNearest(cents: Array[(Int, Array[Double])]) =
    Bridge.column(NearestCentroid(
      Bridge.expression(col("embedding")), cents.map(_._2), cents.map(_._1)))

  private def kernelProbes(cents: Array[(Int, Array[Double])], nprobe: Int) =
    Bridge.column(ProbeClusters(
      Bridge.expression(col("embedding")), cents.map(_._2), cents.map(_._1), nprobe))

  private def randomVecs(seed: Int, n: Int, dim: Int) = {
    val rnd = new scala.util.Random(seed)
    import spark.implicits._
    (0 until n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextGaussian())))
      .toDF("vec_id", "embedding")
  }

  test("nearest: kernel == struct-array reference on random double vectors") {
    val cents = codebook(1, 16, 8)
    val df = randomVecs(2, 500, 8)
    val got = df.select(col("vec_id"),
      kernelNearest(cents).as("k"),
      IvfIndex.nearestColViaStructs(col("embedding"), cents).as("r"))
      .filter(col("k") =!= col("r"))
    assert(got.count() === 0)
  }

  test("nearest: kernel == reference on FLOAT vectors") {
    val cents = codebook(3, 7, 6)
    val df = randomVecs(4, 300, 6)
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val got = df.select(
      kernelNearest(cents).as("k"),
      IvfIndex.nearestColViaStructs(col("embedding"), cents).as("r"))
      .filter(col("k") =!= col("r"))
    assert(got.count() === 0)
  }

  test("nearest: exact score ties break to the lower cluster id") {
    // duplicate centroids: identical scores for cids 2 and 5 on every row
    val base = codebook(5, 6, 4)
    val cents = base.updated(5, (5, base(2)._2.clone()))
    val df = randomVecs(6, 200, 4)
    val rows = df.select(
      kernelNearest(cents).as("k"),
      IvfIndex.nearestColViaStructs(col("embedding"), cents).as("r"))
      .collect()
    assert(rows.forall(r => r.getInt(0) === r.getInt(1)))
    // and the duplicated pair itself must elect 2, never 5
    assert(!rows.exists(_.getInt(0) == 5))
  }

  test("probes: kernel == slice(array_sort(structs)) incl. order, all nprobe") {
    val cents = codebook(7, 16, 8)
    val df = randomVecs(8, 300, 8)
    for (nprobe <- Seq(1, 4, 16)) {
      val got = df.select(
        kernelProbes(cents, nprobe).as("k"),
        IvfIndex.probeClustersViaStructs(col("embedding"), cents, nprobe).as("r"))
        .filter(not(col("k") === col("r")))
      assert(got.count() === 0, s"nprobe=$nprobe")
    }
  }

  test("probes: nprobe larger than the codebook returns all cids, ordered") {
    val cents = codebook(9, 3, 4)
    val df = randomVecs(10, 50, 4)
    val got = df.select(
      kernelProbes(cents, 10).as("k"),
      IvfIndex.probeClustersViaStructs(col("embedding"), cents, 10).as("r"))
      .filter(not(col("k") === col("r")))
    assert(got.count() === 0)
  }

  test("NULL embedding yields NULL from the kernel (nullIntolerant)") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[Seq[Double]]),
      (2L, Some(Seq(1.0, 2.0)))).toDF("vec_id", "embedding")
    val cents = codebook(11, 2, 2)
    val rows = df.select(col("vec_id"), kernelNearest(cents).as("k"))
      .orderBy("vec_id").collect()
    assert(rows(0).isNullAt(1))
    assert(!rows(1).isNullAt(1))
  }
}
