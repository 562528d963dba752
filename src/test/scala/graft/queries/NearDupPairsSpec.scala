package graft.queries

import graft.SparkSpec
import graft.functions.{TextFingerprints, TextKernels, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Brute-force ground truth for the two pair-level dedup operators that
  * ship as q64/q65:
  *
  *  - simhash banding (4×16-bit bands) is candidate-COMPLETE for Hamming
  *    ≤ 3 by pigeonhole, so [[TextQueries.simhashPairsFrom]] must emit
  *    EXACTLY the all-pairs `hamming64 ≤ 3` set — banding is an equality
  *    here, not an approximation — and the hot-bucket cap must drop
  *    exactly the pairs whose every shared band-bucket is oversized.
  *  - [[TextQueries.winnowOverlapFrom]] must match a direct replay of the
  *    MOSS inverted-index scoring (df-capped rare fingerprints, shared
  *    count, `n_shared / min(|rare_a|, |rare_b|)`).
  *
  * Plus the sf0.1 headroom check the q64 oracle comment used to make as an
  * unverified claim: the largest simhash band bucket on the real corpus
  * stays far below the default cap, so capped-Spark ≡ capped-oracle ≡
  * uncapped brute force on the graded data.
  */
class NearDupPairsSpec extends SparkSpec {

  /** Deterministic corpus with planted duplicate structure: base docs of
    * random tokens, plus exact copies (Hamming 0) and one-token edits
    * (small Hamming, some within the ≤3 band) under fresh doc_ids.
    */
  private def corpus(seed: Int, nBase: Int): Seq[(Long, String)] = {
    val rnd   = new scala.util.Random(seed)
    val vocab = Vector.tabulate(200)(i => s"w${i}x")
    def doc() = Seq.fill(30 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
    val base  = Seq.tabulate(nBase)(i => (i.toLong, doc()))
    val dups = base.take(nBase / 3).zipWithIndex.map { case ((_, toks), i) =>
      (1000L + i, toks) // exact dup: Hamming 0, must always be found
    }
    val edits = base.slice(nBase / 3, 2 * nBase / 3).zipWithIndex.map {
      case ((_, toks), i) =>
        val j = rnd.nextInt(toks.size)
        (2000L + i, toks.updated(j, vocab(rnd.nextInt(vocab.size))))
    }
    (base ++ dups ++ edits).map { case (id, toks) => (id, toks.mkString(" ")) }
  }

  private def simhashed(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text").select(
      col("doc_id"),
      TextFingerprints.simhash64(TextOps.tokens(TextOps.normalized(col("text"))))
        .as("simhash"))
  }

  private def bruteHammingPairs(
      sh: Map[Long, Long], maxHamming: Int): Set[(Long, Long, Long)] = {
    val ids = sh.keys.toSeq.sorted
    (for {
      i <- ids.indices; j <- (i + 1) until ids.size
      h = TextKernels.hamming64(sh(ids(i)), sh(ids(j)))
      if h <= maxHamming
    } yield (ids(i), ids(j), h.toLong)).toSet
  }

  test("simhash banding emits exactly the brute-force Hamming<=3 pair set") {
    val rows = corpus(seed = 7, nBase = 45)
    val sh   = simhashed(rows)
    val fps  = sh.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = bruteHammingPairs(fps, maxHamming = 3)
    assert(want.exists(_._3 == 0L), "corpus must contain planted exact dups")
    assert(want.exists(_._3 > 0L),
      "corpus should contain a near-dup (0 < hamming <= 3) for the test to bite")
    val got = TextQueries.simhashPairsFrom(sh)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("hot-bucket cap drops pairs whose every shared band-bucket is oversized") {
    // 10 identical docs: every band bucket containing them has size >= 10,
    // so cap 5 suppresses all 45 pairs; the default cap keeps them.
    val sh = simhashed(Seq.tabulate(10)(i => (i.toLong, "same text in every copy")))
    assert(TextQueries.simhashPairsFrom(sh, maxBucket = 5).count() === 0L)
    assert(TextQueries.simhashPairsFrom(sh).count() === 45L)
  }

  test("sf0.1 corpus: largest simhash band bucket is far below the default cap") {
    val sh = sfSimhashes("/root/testdata/sf0.1")
    val maxBucket = sh
      .filter(col("simhash").isNotNull)
      .select(posexplode(array((0 to 3).map(j =>
        shiftright(col("simhash"), 16 * j).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band", "key")))
      .groupBy("band", "key").count()
      .agg(max("count")).head().getLong(0)
    // headroom: the q64 oracle replays the cap, so Spark-vs-oracle parity
    // holds regardless — this asserts the cap also never BITES on graded
    // data, with ≥2× headroom (measured: 291 at sf0.1)
    assert(maxBucket * 2 < TextQueries.defaultMaxBucket,
      s"sf0.1 max band bucket $maxBucket is uncomfortably close to the cap")
  }

  private def sfSimhashes(dir: String): DataFrame =
    graft.Tables.documents(spark, dir).select(
      col("doc_id"),
      TextFingerprints.simhash64(TextOps.tokens(TextOps.normalized(col("text"))))
        .as("simhash"))

  // ---- winnow overlap ----

  /** Docs built from shared sentence fragments so fingerprint overlap is
    * real: some pairs share most content (overlap near 1), some share one
    * boilerplate sentence (df above the cap → must NOT count), some share
    * nothing.
    */
  private def winnowCorpus(seed: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val boiler = "this boilerplate footer appears on every single document in the corpus"
    def sentence() =
      Seq.fill(12)(s"t${rnd.nextInt(400)}q").mkString(" ")
    val bodies = Seq.tabulate(24)(_ => Seq.fill(4)(sentence()))
    val docs = bodies.zipWithIndex.map { case (ss, i) =>
      (i.toLong, (ss :+ boiler).mkString(" "))
    }
    // near-dups: same body with one sentence replaced
    val nd = bodies.take(8).zipWithIndex.map { case (ss, i) =>
      (100L + i, (ss.updated(1, sentence()) :+ boiler).mkString(" "))
    }
    docs ++ nd
  }

  private def bruteWinnowOverlap(
      fps: Map[Long, Seq[String]], maxDf: Int, minOverlap: Double)
      : Set[(Long, Long, Long, Double)] = {
    val df = fps.values.flatten.groupBy(identity).map { case (f, xs) => f -> xs.size }
    // rare = fingerprints whose posting list survives the df cap
    val rare = fps.map { case (id, f) => id -> f.filter(df(_) <= maxDf).toSet }
    val ids  = fps.keys.toSeq.sorted
    (for {
      i <- ids.indices; j <- (i + 1) until ids.size
      a = ids(i); b = ids(j)
      shared = (rare(a) intersect rare(b)).size
      if shared > 0
      overlap = shared.toDouble / math.min(rare(a).size, rare(b).size)
      if overlap >= minOverlap
    } yield (a, b, shared.toLong, overlap)).toSet
  }

  test("winnow overlap matches the brute-force inverted-index scoring") {
    import spark.implicits._
    val rows = winnowCorpus(seed = 13)
    val fpDf = rows.toDF("doc_id", "text").select(
      col("doc_id"),
      TextFingerprints.winnowFingerprint(TextOps.normalized(col("text")), 8, 16)
        .as("fps"))
    val local = fpDf.collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    val boilerDf = {
      val df = local.values.flatten.groupBy(identity).map(_._2.size)
      df.max
    }
    assert(boilerDf > 16,
      "corpus must contain a boilerplate fingerprint above the df cap")
    val want = bruteWinnowOverlap(local, maxDf = 16, minOverlap = 0.5)
    assert(want.nonEmpty, "corpus must contain overlap pairs above threshold")
    val got = TextQueries.winnowOverlapFrom(fpDf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got === want)
  }
}
