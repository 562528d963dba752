package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PqIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("codebooks have exactly k codewords per subspace; encode is in range") {
    val emb   = Tables.embeddings(spark, sf)
    val books = PqIndex.train(emb, m = 8, k = 32, iters = 4)
    assert(books.length === 8)
    books.foreach { b =>
      assert(b.length === 32)
      b.foreach(c => assert(c.length === 8)) // 64 dims / 8 subspaces
    }
    val codes = PqIndex.encode(emb, books)
    val flat = codes.select(explode(col("codes")).as("c"))
    val mm = flat.agg(min("c"), max("c"), count(lit(1))).head
    assert(mm.getInt(0) >= 0 && mm.getInt(1) <= 31)
    assert(mm.getLong(2) === 500L * 8L)
  }

  test("train and encode are deterministic across invocations") {
    val emb = Tables.embeddings(spark, sf)
    def snap() = {
      val books = PqIndex.train(emb, m = 8, k = 32, iters = 4)
      PqIndex.encode(emb, books).orderBy("vec_id")
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toSeq
    }
    assert(snap() === snap())
  }

  test("ADC kNN recalls the exact L2 neighbors at a useful rate") {
    val emb = Tables.embeddings(spark, sf)
    // exact L2 brute force — same metric family PQ approximates
    val exact = emb
      .select(col("vec_id"), col("embedding"))
      .join(broadcast(emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))),
        col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        graft.functions.VectorOps.l2Sq(col("qe"), col("embedding")).as("d"))
    val truth = RelationalOps.topKPerGroup(
        exact, Seq("q_id"), Seq(col("d").asc, col("neighbor_id").asc), 5)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val books = PqIndex.train(emb, m = 8, k = 32, iters = 4)
    val pq = graft.queries.VectorQueries.queries("q56_knn_pq")(spark, sf)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.intersect(pq).size.toDouble / truth.size
    info(s"PQ ADC recall@5 vs exact L2 = $recall (uniform-random corpus)")
    assert(recall >= 0.2, s"recall $recall")
  }

  test("ADC distance equals the directly-computed quantized distance") {
    val emb   = Tables.embeddings(spark, sf)
    val books = PqIndex.train(emb, m = 8, k = 32, iters = 4)
    val codes = PqIndex.encode(emb, books)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toArray)).toMap
    val vecs = emb.select("vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    val adc = graft.queries.VectorQueries.queries("q56_knn_pq")(spark, sf)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(adc.nonEmpty)
    val ds = 8
    adc.foreach { case ((q, n), dist) =>
      // Σ_j (‖c_j‖² − 2·q_j·c_j) re-derived from raw codebooks and codes
      val expected = (0 until 8).map { j =>
        val c  = books(j)(codes(n)(j))
        val qv = vecs(q)
        var dot = 0.0
        var cn  = 0.0
        var t = 0
        while (t < ds) { dot += qv(j * ds + t) * c(t); cn += c(t) * c(t); t += 1 }
        cn - 2.0 * dot
      }.sum
      assert(math.abs(dist - expected) <= 1e-9, s"($q,$n): $dist vs $expected")
    }
  }

  test("ragged codebooks (low-cardinality subspace) keep ADC exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // first subspace is constant zero → its codebook collapses to ONE
    // codeword; a uniform k stride would corrupt every later LUT block
    val data = (0L until 200L).map { i =>
      (i, Array.fill(8)(0.0f) ++ Array.fill(56)(rnd.nextGaussian().toFloat))
    }
    val df = data.toSeq.toDF("vec_id", "embedding").repartition(4)
    val books = PqIndex.train(df, m = 8, k = 32, iters = 2)
    assert(books(0).length === 1)
    assert(books(1).length > 1)
    val codes = PqIndex.encode(df, books)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toArray)).toMap
    val qs = df.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val out = PqIndex.knn(codes = PqIndex.encode(df, books), queries = qs,
      books = books, topK = 3).collect()
    assert(out.length === 15)
    // re-derive each adc_dist from raw codebooks + codes with offset
    // indexing — catches any stride/offset mismatch
    val vecs = data.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    val ds = 8
    out.foreach { r =>
      val (q, n, dist) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val expected = books.indices.map { j =>
        val c  = books(j)(codes(n)(j))
        val qv = vecs(q)
        var dot = 0.0
        var cn  = 0.0
        var t = 0
        while (t < ds) { dot += qv(j * ds + t) * c(t); cn += c(t) * c(t); t += 1 }
        cn - 2.0 * dot
      }.sum
      assert(math.abs(dist - expected) <= 1e-9, s"($q,$n): $dist vs $expected")
    }
  }

  test("IVF-PQ composition returns full top-k and respects cluster pruning") {
    val r = graft.queries.VectorQueries.queries("q57_knn_ivfpq")(spark, sf)
      .collect()
    assert(r.length === 50) // 10 queries × top-5
    // a pruned search can never return a candidate twice
    val pairs = r.map(x => (x.getLong(0), x.getLong(1)))
    assert(pairs.distinct.length === pairs.length)
  }

  test("trainDet is bit-identical across invocations AND repartitionings") {
    val emb = Tables.embeddings(spark, sf)
    def snap(df: org.apache.spark.sql.DataFrame) =
      PqIndex.trainDet(df, m = 8, k = 32, iters = 2)
        .map(_.map(_.toList).toList).toList
    val base = snap(emb)
    assert(base === snap(emb)) // re-invocation
    // the driver-side sample re-sort makes the codebooks
    // partitioning-INDEPENDENT — the property that lets the q56b/q57b
    // oracles replay training bit-exactly
    assert(base === snap(emb.repartition(7)))
    assert(base === snap(emb.repartition(1)))
  }

  test("trainDet one-step codebooks are the exact sample-order Lloyd result") {
    val emb = Tables.embeddings(spark, sf)
    // recompute one Lloyd step independently: the md5-ordered sample, the
    // first-k-distinct init, l2 argmin with first-min ties, and the
    // mean as a left-to-right fold in SAMPLE order — the exact accumulation
    // contract the q56b oracle replays — then compare bit-for-bit
    val (m, k, ds) = (8, 32, 8)
    val sample = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        md5(concat(col("vec_id").cast("string"), lit(":pqseed"))).as("key"))
      .collect()
      .map(r => (r.getString(2), r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(t => (t._1, t._2)).take(2048).map(_._3)
    val step = PqIndex.trainDet(emb, m = m, k = k, iters = 1)
    for (j <- 0 until m) {
      val pts   = sample.map(_.slice(j * ds, (j + 1) * ds))
      val seeds = pts.map(_.toSeq).distinct.take(k).map(_.toArray)
      val assigned = pts.map { p =>
        seeds.zipWithIndex.minBy { case (c, ci) =>
          (p.zip(c).foldLeft(0.0)((a, t) => a + (t._1 - t._2) * (t._1 - t._2)), ci)
        }._2
      }
      val expect = seeds.indices.map { ci =>
        val members = pts.zip(assigned).collect { case (p, a) if a == ci => p }
        if (members.isEmpty) seeds(ci).toSeq
        else (0 until ds).map(t =>
          members.foldLeft(0.0)((acc, p) => acc + p(t)) / members.length)
      }
      assert(step(j).map(_.toSeq).toSeq === expect, s"subspace $j")
    }
  }

  test("deterministic-training PQ (q56b) reaches the same recall class as q56") {
    val emb = Tables.embeddings(spark, sf)
    val exact = emb
      .select(col("vec_id"), col("embedding"))
      .join(broadcast(emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))),
        col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        graft.functions.VectorOps.l2Sq(col("qe"), col("embedding")).as("d"))
    val truth = RelationalOps.topKPerGroup(
        exact, Seq("q_id"), Seq(col("d").asc, col("neighbor_id").asc), 5)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val det = graft.queries.VectorQueries.queries("q56b_knn_pq_det")(spark, sf)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.intersect(det).size.toDouble / truth.size
    info(s"deterministic PQ ADC recall@5 vs exact L2 = $recall")
    assert(recall >= 0.2, s"recall $recall")
  }

  test("deterministic IVF-PQ (q57b) returns full deduplicated top-k") {
    val r = graft.queries.VectorQueries.queries("q57b_knn_ivfpq_det")(spark, sf)
      .collect()
    assert(r.length === 50) // 10 queries × top-5
    val pairs = r.map(x => (x.getLong(0), x.getLong(1)))
    assert(pairs.distinct.length === pairs.length)
  }

  test("planted duplicates encode to the same codes and rank first") {
    val corpus = graft.TestFixtures.plantedCopies(spark, sf, noise = 0.02)
    val books = PqIndex.train(corpus, m = 8, k = 32, iters = 4)
    val nQ = 50
    val qs = corpus.filter(col("vec_id") < nQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val top1 = PqIndex.knn(PqIndex.encode(corpus, books), qs, books, topK = 1)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val hit = top1.count { case (q, n) => n == q + 100000L }
    info(s"PQ planted-dup top-1 hits: $hit / $nQ")
    assert(hit >= (nQ * 0.8).toInt, s"$hit of $nQ")
  }
}
