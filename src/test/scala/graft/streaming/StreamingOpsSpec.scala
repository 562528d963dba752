package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingOpsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("weeklyWindow is Monday-aligned, matching date_trunc('week')") {
    import spark.implicits._
    val samples = Seq(
      "2023-01-01 10:00:00", // Sunday → week of Mon 2022-12-26
      "2022-12-26 00:00:00", // Monday boundary itself
      "2023-04-01 22:30:00",
      "1970-01-01 00:00:00", // epoch (a Thursday) → week of Mon 1969-12-29
    ).map(ts)
    val df = samples.toDF("t")
    val out = df.select(
      StreamingOps.weeklyWindow(col("t")).getField("start").cast("date").as("win"),
      date_trunc("week", col("t")).cast("date").as("trunc"))
    assert(out.filter(!(col("win") <=> col("trunc"))).count() === 0)
  }

  test("streaming weekly agg equals the batch weekly agg on the same rows") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val rows = Seq(
      (ts("2023-01-01 10:00:00"), 1L, "gold", "AAPL", "buy", 2.0, 100.0),
      (ts("2023-01-01 11:00:00"), 1L, "gold", "AAPL", "sell", 1.0, 110.0),
      (ts("2023-01-03 10:00:00"), 2L, "bronze", "MSFT", "buy", 3.0, 200.0),
      (ts("2022-12-30 10:00:00"), 1L, "gold", "AAPL", "buy", 5.0, 90.0),
    )
    val cols = Seq("timestamp", "user_id", "client_type", "symbol", "side", "quantity", "price")

    val input = MemoryStream[(Timestamp, Long, String, String, String, Double, Double)]
    val query = StreamingOps.weeklyTradesAgg(input.toDF().toDF(cols: _*))
      .writeStream.format("memory").queryName("weekly_stream")
      .outputMode("complete").start()
    try {
      input.addData(rows: _*)
      query.processAllAvailable()

      val streamed = spark.table("weekly_stream")
        .select("week_start_date", "client_type", "user_id", "symbol",
          "buy_qty", "sell_qty", "total_volume", "trade_count")
        .collect().map(_.toSeq).toSet

      val batch = graft.etl.Transform.weeklyAgg(
          graft.etl.Transform.withDerived(rows.toDF(cols: _*)))
        .select("week_start_date", "client_type", "user_id", "symbol",
          "buy_qty", "sell_qty", "total_volume", "trade_count")
        .collect().map(_.toSeq).toSet

      assert(streamed === batch)
      // (2022-12-26, gold, 1, AAPL) — the Dec-30 and Jan-01 trades share the
      // Monday-2022-12-26 week — plus (2023-01-02, bronze, 2, MSFT)
      assert(streamed.size === 2)
    } finally query.stop()
  }

  test("stream-stream interval join attributes purchases to preceding clicks") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks    = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val cols = Seq("event_id", "user_id", "ts")
    val joined = StreamingOps.attributionJoin(
      purchases.toDF().toDF(cols: _*), clicks.toDF().toDF(cols: _*))
    val query = joined.writeStream.format("memory").queryName("attributed")
      .outputMode("append").start()
    try {
      clicks.addData(
        (100L, 1L, ts("2023-01-01 09:30:00")), // within 1h of purchase
        (101L, 1L, ts("2023-01-01 08:00:00")), // too old
        (102L, 2L, ts("2023-01-01 09:50:00"))) // other user
      purchases.addData((200L, 1L, ts("2023-01-01 10:00:00")))
      query.processAllAvailable()
      val pairs = spark.table("attributed")
        .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
      assert(pairs === Set((200L, 100L)))
    } finally query.stop()
  }

  test("left-outer attribution emits click-less purchases after the watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks    = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val cols = Seq("event_id", "user_id", "ts")
    val joined = StreamingOps.attributionJoin(
      purchases.toDF().toDF(cols: _*), clicks.toDF().toDF(cols: _*),
      joinType = "left_outer")
    val query = joined.writeStream.format("memory").queryName("attributed_outer")
      .outputMode("append").start()
    try {
      // a purchase with no click at all
      purchases.addData((300L, 5L, ts("2023-01-01 10:00:00")))
      clicks.addData((400L, 6L, ts("2023-01-01 10:00:00"))) // other user
      query.processAllAvailable()
      // advance the watermark on BOTH sides well past the join window
      purchases.addData((301L, 5L, ts("2023-01-01 14:00:00")))
      clicks.addData((401L, 6L, ts("2023-01-01 14:00:00")))
      query.processAllAvailable()
      purchases.addData((302L, 5L, ts("2023-01-01 18:00:00")))
      clicks.addData((402L, 6L, ts("2023-01-01 18:00:00")))
      query.processAllAvailable()

      val out = spark.table("attributed_outer")
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      assert(out.contains((300L, None)), out.toSeq) // organic purchase surfaced
      assert(!out.exists(_._2.exists(Set(400L, 401L, 402L))), out.toSeq) // never cross-user
    } finally query.stop()
  }

  test("upsert sink keeps exactly one latest row per key across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert")
    val input = MemoryStream[(Long, Double, Timestamp)]
    val counts = input.toDF().toDF("user_id", "value", "event_time")
      .groupBy("user_id")
      .agg(count("value").as("n"), sum("value").as("total"))
    val query = StreamingOps.upsertSink(
      counts, Seq("user_id"), s"$dir/table", s"$dir/ckpt")
    try {
      input.addData((1L, 10.0, ts("2023-01-01 10:00:00")), (2L, 5.0, ts("2023-01-01 10:01:00")))
      query.processAllAvailable()
      input.addData((1L, 20.0, ts("2023-01-01 10:02:00")))
      query.processAllAvailable()
      val out = spark.read.parquet(s"$dir/table")
        .collect().map(r => r.getAs[Long]("user_id") -> (r.getAs[Long]("n"), r.getAs[Double]("total"))).toMap
      // user 1 was UPDATED in place (2 events, total 30), not appended twice
      assert(out === Map(1L -> (2L, 30.0), 2L -> (1L, 5.0)))
    } finally query.stop()
  }

  test("upsert sink updates a NULL-keyed group in place (null-safe merge)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_null")
    val input = MemoryStream[(Option[String], Double, Timestamp)]
    // symbol is the key and can be NULL — a plain equi-anti-join never
    // matches null=null, so the null group's stale row used to survive
    // every merge and the table accreted one duplicate per touching batch
    val counts = input.toDF().toDF("symbol", "value", "event_time")
      .groupBy("symbol")
      .agg(count("value").as("n"), sum("value").as("total"))
    val query = StreamingOps.upsertSink(
      counts, Seq("symbol"), s"$dir/table", s"$dir/ckpt")
    try {
      input.addData((None, 1.0, ts("2023-01-01 10:00:00")),
        (Some("AAPL"), 5.0, ts("2023-01-01 10:01:00")))
      query.processAllAvailable()
      input.addData((None: Option[String], 2.0, ts("2023-01-01 10:02:00")))
      query.processAllAvailable()
      val out = spark.read.parquet(s"$dir/table")
        .collect().map(r => Option(r.getAs[String]("symbol")) ->
          (r.getAs[Long]("n"), r.getAs[Double]("total"))).toMap
      assert(out === Map(None -> (2L, 3.0), Some("AAPL") -> (1L, 5.0)))
      // exactly ONE row per key — the null group was not duplicated
      assert(spark.read.parquet(s"$dir/table").count() === 2)
    } finally query.stop()
  }

  test("upsert sink recovery converges a mid-retire crash (journaled swap)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dir   = java.nio.file.Files.createTempDirectory("graft_upsert_rec")
    val table = s"$dir/table"
    // Simulate a crash mid non-atomic table→__old rename (object-store
    // copy+delete, marker and one part already moved, the other part
    // still at the table path) with the swap journal in its "retire"
    // phase — the split-history state TableSwapSpec covers at the FS
    // level, here driven through the streaming upsert sink end-to-end.
    Seq((9L, 3L, 33.0)).toDF("user_id", "n", "total")
      .coalesce(1).write.parquet(s"${table}__old")
    Seq((1L, 5L, 50.0)).toDF("user_id", "n", "total")
      .coalesce(1).write.parquet(table)
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(table, "_SUCCESS"), false)
    val journal = fs.create(
      new org.apache.hadoop.fs.Path(s"${table}__swapstate"), true)
    try journal.write("retire".getBytes("UTF-8")) finally journal.close()

    val input = MemoryStream[(Long, Double, Timestamp)]
    val counts = input.toDF().toDF("user_id", "value", "event_time")
      .groupBy("user_id")
      .agg(count("value").as("n"), sum("value").as("total"))
    val query = StreamingOps.upsertSink(
      counts, Seq("user_id"), table, s"$dir/ckpt")
    try {
      input.addData((1L, 10.0, ts("2023-01-01 10:00:00")))
      query.processAllAvailable()
      val out = spark.read.parquet(table)
        .collect().map(r => r.getAs[Long]("user_id") ->
          (r.getAs[Long]("n"), r.getAs[Double]("total"))).toMap
      // user 9 survives ONLY if recovery converged the split history (its
      // row lived under __old); user 1 is replaced by the batch's fresh row
      assert(out === Map(1L -> (1L, 10.0), 9L -> (3L, 33.0)))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${table}__old")))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${table}__swapstate")))
    } finally query.stop()
  }

  test("streaming dedup drops same-fingerprint docs within the watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs  = input.toDF().toDF("doc_id", "text", "event_time")
    val query = StreamingOps.dedupStream(
        docs, graft.functions.TextOps.fingerprintMd5(col("text")), "event_time")
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "Hello   World", ts("2023-01-01 10:00:00")),
        (2L, "hello world",   ts("2023-01-01 10:05:00")), // dup (normalized)
        (3L, "different doc", ts("2023-01-01 10:06:00")))
      query.processAllAvailable()
      input.addData((4L, "HELLO WORLD", ts("2023-01-01 10:10:00"))) // still dup
      query.processAllAvailable()
      val ids = spark.table("deduped").select("doc_id").as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 3L))
    } finally query.stop()
  }

  test("streaming vocabulary counts equal the batch counts, batch over batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val query = StreamingOps.termCounts(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("vocab_stream")
      .outputMode("complete").start()
    try {
      def counts(df: org.apache.spark.sql.DataFrame) = df
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val batch1 = Seq((1L, "the quick fox"), (2L, "the lazy dog"))
      input.addData(batch1)
      query.processAllAvailable()
      val expected1 = counts(
        StreamingOps.termCounts(batch1.toDF("doc_id", "text")))
      assert(counts(spark.table("vocab_stream")) === expected1)
      assert(expected1("the") === 2L)
      // counts keep accumulating across micro-batches
      val batch2 = Seq((3L, "the quick brown fox"))
      input.addData(batch2)
      query.processAllAvailable()
      val expectedAll = counts(
        StreamingOps.termCounts((batch1 ++ batch2).toDF("doc_id", "text")))
      assert(counts(spark.table("vocab_stream")) === expectedAll)
      assert(expectedAll("the") === 3L)
    } finally query.stop()
  }

  test("streaming near-dup candidates match the batch LSH pairs") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank"), // dup of 1
      (3L, "completely different content about streaming watermarks and state"),
      (4L, "the quick brown fox jumps over the lazy dog near the river bend"), // near-dup
    )
    val input = MemoryStream[(Long, String, Timestamp)]
    val query = StreamingOps.neardupCandidates(
        input.toDF().toDF("doc_id", "text", "event_time"))
      .writeStream.format("memory").queryName("neardup_cand")
      .outputMode("append").start()
    try {
      input.addData(texts.map { case (id, t) =>
        (id, t, ts(s"2023-01-01 10:0$id:00")) })
      query.processAllAvailable()
      val stream = spark.table("neardup_cand")
        .select("doc_a", "doc_b").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = graft.queries.TextQueries
        .candidatePairsFrom(graft.queries.TextQueries.sigsFrom(
          graft.queries.TextQueries.shingledDocs(
            texts.toDF("doc_id", "text"))))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch.contains((1L, 2L))) // sanity: the dup pair exists at all
      assert(stream === batch)
    } finally query.stop()
  }

  test("streaming dup-passage candidates match the batch shared-gram pairs") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val passage =
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val texts = Seq(
      (1L, s"$passage uno dos tres cuatro cinco"),
      (2L, s"xray yankee zulu $passage"), // shares the 12-word passage with 1
      (3L, "one two three four five six seven eight nine ten eleven twelve"),
      (4L, s"$passage uno dos tres cuatro cinco"), // exact dup of 1
    )
    val input = MemoryStream[(Long, String, Timestamp)]
    val query = StreamingOps.dupPassageCandidates(
        input.toDF().toDF("doc_id", "text", "event_time"))
      .writeStream.format("memory").queryName("duppass_cand")
      .outputMode("append").start()
    try {
      // the exact dup arrives in a LATER micro-batch: its pairs come from
      // state, not intra-batch ordering
      input.addData(texts.take(3).map { case (id, t) =>
        (id, t, ts(s"2023-01-01 10:0$id:00")) })
      query.processAllAvailable()
      input.addData((4L, texts(3)._2, ts("2023-01-01 10:04:00")))
      query.processAllAvailable()
      val stream = spark.table("duppass_cand")
        .select("doc_a", "doc_b").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch truth: unordered doc pairs sharing ≥1 word-10-gram hash
      import org.apache.spark.sql.functions.{array_distinct, col, explode, md5, substring, transform}
      import graft.functions.TextOps
      val occ = texts.toDF("doc_id", "text")
        .select(col("doc_id"),
          explode(array_distinct(transform(
            TextOps.wordGramsWithRepeats(
              TextOps.tokens(TextOps.normalized(col("text"))),
              graft.queries.TextQueries.dupPassageGramN),
            g => substring(md5(g), 1, 16)))).as("h"))
      val batch = occ.as("a")
        .join(occ.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch === Set((1L, 2L), (1L, 4L), (2L, 4L))) // hand truth
      assert(stream === batch)
    } finally query.stop()
  }

  test("streaming chunk dedup keeps the batch q77 canonical occurrences") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val uniqueA =
      "the quick brown fox jumps over one lazy dog while seventeen sparrows argue about breadcrumbs near the old stone fountain"
    val uniqueB =
      "meanwhile a completely different caravan of merchants counts copper coins under a violet sky as distant thunder rolls"
    val passage =
      "this shared passage of considerable length repeats verbatim across documents and therefore its interior chunks must deduplicate"
    // no within-doc repeats: the batch argmin and first-arrival-wins then
    // pick the SAME (doc_id, chunk_fp) occurrences when arrival order
    // follows doc_id order
    val texts = Seq(
      (1L, s"$uniqueA $passage"),
      (2L, s"$uniqueB $passage"), // later arrival: shared chunks drop
      (3L, s"$uniqueA $passage"), // exact dup of 1: everything drops
    )
    val input = MemoryStream[(Long, String, Timestamp)]
    val query = StreamingOps.chunkDedupStream(
        input.toDF().toDF("doc_id", "text", "event_time"))
      .writeStream.format("memory").queryName("chunk_dedup_stream")
      .outputMode("append").start()
    try {
      // one micro-batch per doc, in doc_id order — state, not batch order,
      // enforces first-arrival-wins
      texts.foreach { case (id, t) =>
        input.addData((id, t, ts(s"2023-01-01 10:0$id:00")))
        query.processAllAvailable()
      }
      val streamed = spark.table("chunk_dedup_stream")
        .select("doc_id", "chunk_fp").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val batchKept = graft.queries.TextQueries
        .chunkDedupApplyOf(texts.toDF("doc_id", "text"))
      // batch canonical occurrences, rebuilt from the chunk table
      val chunks = graft.queries.TextQueries
        .cdcChunksOf(texts.toDF("doc_id", "text"))
      val canonical = chunks.groupBy("chunk_fp")
        .agg(org.apache.spark.sql.functions.min(
          org.apache.spark.sql.functions.struct(
            org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.col("chunk_start"))).as("c"))
        .select(org.apache.spark.sql.functions.col("c.doc_id"),
          org.apache.spark.sql.functions.col("chunk_fp"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(streamed === canonical)
      // and the doc-level shape agrees with the batch apply: doc 3 kept 0
      val kept3 = batchKept.filter(col("doc_id") === 3L)
        .select("n_kept").collect().head.getLong(0)
      assert(kept3 === 0L)
      assert(streamed.count(_._1 == 3L) === 0)
    } finally query.stop()
  }

  test("streaming admission dedup matches the batch incrementalDedup contract") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the IncrementalDedupSpec fixture: disjoint token alphabets per family
    def body(tag: String) = Seq.tabulate(40)(j => s"$tag$j").mkString(" ")
    val base = Seq(
      (1L, body("a")), (2L, body("b")), (3L, body("c"))).toDF("doc_id", "text")
    val batch = Seq(
      (10L, body("a")),                          // exact copy → refused
      (11L, body("b").replace("b39", "CHANGED")), // near-dup → refused
      (12L, body("z")),                          // novel → admitted
      (13L, body("y")),                          // within-batch dup pair:
      (14L, body("y")))                          // BOTH admitted
    val input = MemoryStream[(Long, String)]
    val query = StreamingOps.admissionDedupStream(
        input.toDF().toDF("doc_id", "text"), base)
      .writeStream.format("memory").queryName("admission")
      .outputMode("append").start()
    try {
      // one doc per micro-batch: statelessness means order cannot matter,
      // and the within-batch dup pair must survive even arriving apart
      batch.foreach { row => input.addData(row); query.processAllAvailable() }
      val streamed = spark.table("admission")
        .select("doc_id").as[Long].collect().toSet
      val batchKept = graft.queries.TextQueries
        .incrementalDedup(base, batch.toDF("doc_id", "text"))
        .select("doc_id").as[Long].collect().toSet
      assert(streamed === batchKept)
      assert(streamed === Set(12L, 13L, 14L))
    } finally query.stop()
  }

  test("near-dup candidate state expires past the watermark horizon") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dup = "the quick brown fox jumps over the lazy dog near the river bank"
    val input = MemoryStream[(Long, String, Timestamp)]
    val query = StreamingOps.neardupCandidates(
        input.toDF().toDF("doc_id", "text", "event_time"),
        delay = "10 minutes")
      .writeStream.format("memory").queryName("neardup_exp")
      .outputMode("append").start()
    try {
      input.addData((1L, dup, ts("2023-01-01 10:00:00")))
      query.processAllAvailable()
      // push the watermark far past doc 1's horizon
      input.addData((2L, "unrelated filler text to advance the watermark only",
        ts("2023-01-01 12:00:00")))
      query.processAllAvailable()
      // doc 3 duplicates doc 1 but arrives hours later: state must be gone
      input.addData((3L, dup, ts("2023-01-01 12:01:00")))
      query.processAllAvailable()
      val pairs = spark.table("neardup_exp")
        .select("doc_a", "doc_b").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!pairs.contains((1L, 3L)), pairs.toString)
    } finally query.stop()
  }

  test("near-dup candidate state is retained ACROSS batches within the horizon") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // positive control for the expiry test above: if state writes were
    // broken so candidates never survived a batch boundary, the expiry
    // test would pass VACUOUSLY (no cross-batch pair ever forms) and the
    // single-batch parity tests wouldn't notice either
    val dup = "the quick brown fox jumps over the lazy dog near the river bank"
    val input = MemoryStream[(Long, String, Timestamp)]
    val query = StreamingOps.neardupCandidates(
        input.toDF().toDF("doc_id", "text", "event_time"),
        delay = "10 minutes")
      .writeStream.format("memory").queryName("neardup_retain")
      .outputMode("append").start()
    try {
      input.addData((1L, dup, ts("2023-01-01 10:00:00")))
      query.processAllAvailable()
      // doc 3 duplicates doc 1 in a LATER micro-batch, 2 min later —
      // well inside the 10-minute horizon: the pair MUST form
      input.addData((3L, dup, ts("2023-01-01 10:02:00")))
      query.processAllAvailable()
      val pairs = spark.table("neardup_retain")
        .select("doc_a", "doc_b").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 3L)), pairs.toString)
    } finally query.stop()
  }

  test("streaming simhash candidates equal the batch banded pair set") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank"), // dup of 1
      (3L, "completely different content about streaming watermarks and state"),
      (4L, "the quick brown fox jumps over the lazy dog near the river bend"), // near-dup
    )
    val input = MemoryStream[(Long, String, Timestamp)]
    val query = StreamingOps.simhashCandidates(
        input.toDF().toDF("doc_id", "text", "event_time"))
      .writeStream.format("memory").queryName("simhash_cand")
      .outputMode("append").start()
    try {
      input.addData(texts.map { case (id, t) =>
        (id, t, ts(s"2023-01-01 10:0$id:00")) })
      query.processAllAvailable()
      val stream = spark.table("simhash_cand")
        .select("doc_a", "doc_b").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // maxHamming = 64 disables the verify filter → the raw banded
      // candidate set, which is what the stream emits pre-verify
      val batch = graft.queries.TextQueries.simhashPairsFrom(
          texts.toDF("doc_id", "text").select(col("doc_id"),
            graft.functions.TextFingerprints.simhash64(
              graft.functions.TextOps.tokens(
                graft.functions.TextOps.normalized(col("text"))))
              .as("simhash")),
          maxHamming = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch.contains((1L, 2L))) // sanity: the dup pair exists at all
      assert(stream === batch)
    } finally query.stop()
  }

  test("streaming simhash dedup drops exact-fingerprint dups within the watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val query = StreamingOps.simhashDedupStream(
        input.toDF().toDF("doc_id", "text", "event_time"))
      .writeStream.format("memory").queryName("simhash_dedup")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "Hello   World again", ts("2023-01-01 10:00:00")),
        (2L, "hello world again",   ts("2023-01-01 10:05:00")), // same simhash
        (3L, "entirely different text here", ts("2023-01-01 10:06:00")))
      query.processAllAvailable()
      val ids = spark.table("simhash_dedup").select("doc_id").as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 3L))
    } finally query.stop()
  }

  test("custom sessionizer agrees with the engine-native session_window") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // same event set through both: our flatMapGroupsWithState sessionizer
    // and Spark's built-in session_window aggregation (the Spark-first
    // preference — the custom operator must earn its keep by agreeing)
    val eventsData = Seq(
      (1L, ts("2023-01-01 10:00:00")), (1L, ts("2023-01-01 10:05:00")),
      (1L, ts("2023-01-01 11:00:00")), // >30min gap → new session
      (2L, ts("2023-01-01 10:10:00")))
    val gap = "30 minutes"

    val input = MemoryStream[StreamingOps.SessionEvent]
    val q1 = StreamingOps.sessionize(input.toDS(), gapMicros = 30L * 60 * 1000000)
      .writeStream.format("memory").queryName("sess_custom")
      .outputMode("append").start()
    val input2 = MemoryStream[(Long, Timestamp)]
    val q2 = input2.toDF().toDF("user_id", "event_time")
      .withWatermark("event_time", "10 minutes")
      .groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"))
      .writeStream.format("memory").queryName("sess_native")
      .outputMode("append").start()
    try {
      input.addData(eventsData.map { case (u, t) =>
        StreamingOps.SessionEvent(u, t.getTime * 1000L) })
      // advance both watermarks far enough to close and emit every session
      input.addData(StreamingOps.SessionEvent(99L, ts("2023-01-02 00:00:00").getTime * 1000L))
      q1.processAllAvailable()
      input2.addData(eventsData)
      input2.addData((99L, ts("2023-01-02 00:00:00")))
      q2.processAllAvailable()

      // n_events is Int on the custom side, Long on the native — normalize
      def sessions(table: String) = spark.table(table)
        .filter(col("user_id") =!= 99L)
        .select(col("user_id"), col("session_start_us"),
          col("n_events").cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val custom = sessions("sess_custom")
      assert(custom === sessions("sess_native"))
      assert(custom.size === 3) // two sessions for user 1, one for user 2
    } finally { q1.stop(); q2.stop() }
  }

  test("streaming training export: dedup + quality filter + static codes join") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val good0 = "the quick data pipeline of the spark system and the engine"
    val good3 = "the data model is the core of the training corpus and the tokenizer"
    val input = MemoryStream[(Long, String, Timestamp)]
    val query = StreamingOps.trainingExportStream(
        input.toDF().toDF("doc_id", "text", "event_time"), emb)
      .writeStream.format("memory").queryName("export_stream")
      .outputMode("append").start()
    try {
      input.addData(
        (0L, good0, ts("2023-01-01 10:00:00")),
        (2L, "!!! ??? ### $$$ %%%", ts("2023-01-01 10:10:00")), // low quality
        (3L, good3, ts("2023-01-01 10:15:00")))
      query.processAllAvailable()
      // the exact dup arrives in a LATER micro-batch: first-arrival-wins is
      // then state-enforced, not an artifact of intra-batch ordering (which
      // dropDuplicatesWithinWatermark does not contractually guarantee)
      input.addData((1L, good0, ts("2023-01-01 10:05:00"))) // dup → dropped
      query.processAllAvailable()

      val streamed = spark.table("export_stream").collect().map(_.toSeq).toSet

      // batch twin over the rows that should survive, same shared exprs
      import graft.functions.TextOps
      val codes = graft.queries.VectorQueries.withInt8Codes(emb)
        .select(col("vec_id").as("doc_id"),
          concat_ws(",", transform(col("codes"), _.cast("string"))).as("codes_csv"))
      val expected = Seq((0L, good0), (3L, good3)).toDF("doc_id", "text")
        .select(col("doc_id"), col("text"),
          TextOps.tokens(TextOps.normalized(col("text"))).as("toks"))
        .select(col("doc_id"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
          TextOps.qualityScore(col("text")).as("quality"),
          TextOps.langIdFromTokens(col("toks"), col("text")).as("lang_pred"))
        .join(codes, Seq("doc_id"))
        .collect().map(_.toSeq).toSet

      assert(streamed === expected)
      assert(streamed.size === 2) // dup and low-quality rows are out
    } finally query.stop()
  }

  test("streaming training export with mixture sampling matches the batch pipeline") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    // lang_pred en for the first two, de for the third (stopword vote)
    val en0 = "the quick data pipeline of the spark system and the engine"
    val en1 = "the data model is the core of the training corpus and the tokenizer"
    val de2 = "der hund und die katze ist ein tier der die das und ist hier"
    val rows = Seq((0L, en0), (1L, en1), (2L, de2))
    val rates = Map("en" -> 0.0) // deterministic: en dropped, de kept
    val input = MemoryStream[(Long, String, Timestamp)]
    val query = StreamingOps.trainingExportStream(
        input.toDF().toDF("doc_id", "text", "event_time"), emb,
        minQuality = 0.0, sampleRates = rates)
      .writeStream.format("memory").queryName("export_stream_sampled")
      .outputMode("append").start()
    try {
      input.addData(rows.map { case (i, t) => (i, t, ts("2023-01-01 10:00:00")) }: _*)
      query.processAllAvailable()
      val streamed = spark.table("export_stream_sampled")
        .collect().map(_.toSeq).toSet
      val batch = graft.pipeline.TrainingPipeline.export(
          rows.toDF("doc_id", "text"),
          embeddings = Some(emb),
          cfg = graft.pipeline.TrainingPipeline.Config(
            minQuality = 0.0, dedup = graft.pipeline.TrainingPipeline.NoDedup,
            sampleRates = rates))
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
      assert(streamed.map(_.head) === Set(2L)) // only the de doc survives
    } finally query.stop()
  }

  test("streaming export shardAssign matches the batch q86 key/shard per doc") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val rows = Seq(
      (0L, "the quick data pipeline of the spark system and the engine"),
      (3L, "the data model is the core of the training corpus and the tokenizer"))
    val input = MemoryStream[(Long, String, Timestamp)]
    val query = StreamingOps.trainingExportStream(
        input.toDF().toDF("doc_id", "text", "event_time"), emb,
        minQuality = 0.0, shardAssign = true)
      .writeStream.format("memory").queryName("export_stream_shards")
      .outputMode("append").start()
    try {
      input.addData(rows.map { case (i, t) => (i, t, ts("2023-01-01 10:00:00")) }: _*)
      query.processAllAvailable()
      val streamed = spark.table("export_stream_shards")
        .select("doc_id", "shuffle_key", "shard").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      val batch = graft.queries.TextQueries
        .shuffleShardsOf(rows.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      assert(streamed === batch)
      assert(streamed.map(_._1) === Set(0L, 3L))
    } finally query.stop()
  }

  test("streaming importance scores equal batch q89 under the same frozen weights") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val corpus  = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val weights = graft.queries.TextQueries.importanceWeightsOf(corpus)
    val sample = corpus.filter(col("doc_id") < 10)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val query = StreamingOps.importanceScoreStream(
        input.toDF().toDF("doc_id", "text"), weights)
      .writeStream.format("memory").queryName("imp_stream")
      .outputMode("append").start()
    try {
      input.addData(sample: _*)
      query.processAllAvailable()
      val streamed = spark.table("imp_stream")
        .select("doc_id", "score", "n_tokens").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = graft.queries.TextQueries.importanceScoresOf(corpus)
        .filter(col("doc_id") < 10).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed === batch)
      assert(streamed.size === 10)
    } finally query.stop()
  }

  test("stateful sessionization closes sessions on gap and keeps open ones") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val H = 3600L * 1000000L // one hour in micros
    val input = MemoryStream[StreamingOps.SessionEvent]
    val query = StreamingOps.sessionize(input.toDS(), gapMicros = 30L * 60 * 1000000)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // session 1: three events 10 min apart
      input.addData(
        StreamingOps.SessionEvent(1L, 10 * H),
        StreamingOps.SessionEvent(1L, 10 * H + 600000000L),
        StreamingOps.SessionEvent(1L, 10 * H + 1200000000L))
      query.processAllAvailable()
      assert(spark.table("sessions").count() === 0) // still open

      // an event 2h later closes session 1, opens session 2
      input.addData(StreamingOps.SessionEvent(1L, 12 * H))
      query.processAllAvailable()

      val closed = spark.table("sessions")
        .as[StreamingOps.SessionOut].collect()
      assert(closed.length === 1)
      assert(closed.head === StreamingOps.SessionOut(1L, 10 * H, 10 * H + 1200000000L, 3))
    } finally query.stop()
  }

  test("sessionize: cross-batch out-of-order events fold in ts order; late stragglers drop") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val S = 1000000L // one second in micros
    val gap = 100L * S
    val input = MemoryStream[StreamingOps.SessionEvent]
    val query = StreamingOps.sessionize(input.toDS(), gapMicros = gap)
      .writeStream.format("memory").queryName("sessions_ooo")
      .outputMode("append").start()
    try {
      // batch 1: t=1000s, t=1090s; batch 2 delivers t=1030s OUT OF ORDER
      // (well inside the 10-min watermark); batch 3 t=1140s. The pre-fix
      // fold applied 1030 AFTER 1090, dragging `last` backwards and then
      // splitting at 1140 (110s from the dragged-back last) — batch
      // sessionize over {1000,1030,1090,1140} is ONE session (every
      // ts-order step ≤ 100s).
      input.addData(StreamingOps.SessionEvent(1L, 1000 * S),
        StreamingOps.SessionEvent(1L, 1090 * S))
      query.processAllAvailable()
      input.addData(StreamingOps.SessionEvent(1L, 1030 * S))
      query.processAllAvailable()
      input.addData(StreamingOps.SessionEvent(1L, 1140 * S))
      query.processAllAvailable()
      // advance the watermark far past user 1's gap horizon
      input.addData(StreamingOps.SessionEvent(2L, 3000 * S))
      query.processAllAvailable()
      val u1 = spark.table("sessions_ooo").as[StreamingOps.SessionOut]
        .collect().filter(_.user_id == 1L).toSeq
      assert(u1 === Seq(StreamingOps.SessionOut(1L, 1000 * S, 1140 * S, 4)))

      // late straggler: watermark is now ~2400s; an event at t=100s is
      // BEHIND it and must be dropped (not resurrect a session), per the
      // watermark contract
      input.addData(StreamingOps.SessionEvent(1L, 100 * S))
      query.processAllAvailable()
      input.addData(StreamingOps.SessionEvent(2L, 9000 * S)) // advance wm
      query.processAllAvailable()
      val u1After = spark.table("sessions_ooo").as[StreamingOps.SessionOut]
        .collect().filter(_.user_id == 1L).toSeq
      assert(u1After === u1) // no session containing the dropped t=100s
    } finally query.stop()
  }

  test("streaming contamination alerts flag the same docs as batch q68") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val thirteen =
      "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike"
    val evalDocs = Seq((100L, thirteen)).toDF("doc_id", "text")
    val texts = Seq(
      (1L, "uniform victor whiskey xray yankee zulu uniform victor whiskey xray yankee zulu uniform victor"),
      (2L, s"prefix $thirteen suffix"), // contaminated
      (3L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima november oscar papa"), // 12-run only
      (4L, thirteen),                   // contaminated (exact copy)
    )
    val input = MemoryStream[(Long, String, Timestamp)]
    val query = StreamingOps.contaminationAlerts(
        input.toDF().toDF("doc_id", "text", "event_time"), evalDocs)
      .writeStream.format("memory").queryName("decontam_alerts")
      .outputMode("append").start()
    try {
      input.addData(texts.map { case (id, t) =>
        (id, t, ts(s"2023-01-01 10:0$id:00")) })
      query.processAllAvailable()
      val stream = spark.table("decontam_alerts")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val batch = graft.queries.TextQueries
        .contaminationHits(texts.toDF("doc_id", "text"), evalDocs)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(batch === Set(2L, 4L)) // sanity: the planted overlap is real
      assert(stream === batch)
    } finally query.stop()
  }

  test("streaming funnel matches the batch cascade, including out-of-order arrival") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import StreamingOps.{FunnelEvent, FunnelUpdate}
    val H = 3600L * 1000000L
    // user 1 converts in arrival order; user 2's click ARRIVES before its
    // view (out-of-order within the watermark) and its purchase lands in a
    // later trigger, exercising buffer → committed-minima promotion
    val all = Seq(
      FunnelEvent(1L, 10 * H, "view"),
      FunnelEvent(1L, 10 * H + 60000000L, "click"),
      FunnelEvent(2L, 10 * H + 120000000L, "click"),
      FunnelEvent(1L, 10 * H + 180000000L, "purchase"),
      FunnelEvent(2L, 10 * H + 60000000L, "view"),
      FunnelEvent(2L, 11 * H, "purchase"))
    val input = MemoryStream[FunnelEvent]
    val query = StreamingOps.funnelStream(input.toDS())
      .writeStream.format("memory").queryName("funnel_updates")
      .outputMode("update").start()
    try {
      input.addData(all(0), all(1), all(2))
      query.processAllAvailable()
      input.addData(all(3), all(4))
      query.processAllAvailable()
      input.addData(all(5))
      query.processAllAvailable()
      // beyond-watermark straggler: a 9H view for user 2 arrives after the
      // watermark (11H − 10 min) passed it. If it were (wrongly) folded it
      // would lower view_us to 9H and a NEW distinct snapshot would appear
      // below; the drop contract makes this trigger re-emit the final
      // snapshot unchanged.
      input.addData(FunnelEvent(2L, 9 * H, "view"))
      query.processAllAvailable()

      val updates = spark.table("funnel_updates")
        .as[FunnelUpdate].collect().toSet
      // every emitted snapshot, trigger by trigger: user 2's click stays
      // unqualified until its (late-arriving) view folds in
      assert(updates === Set(
        FunnelUpdate(1L, Some(10 * H), Some(10 * H + 60000000L), None),
        FunnelUpdate(2L, None, None, None),
        FunnelUpdate(1L, Some(10 * H), Some(10 * H + 60000000L),
          Some(10 * H + 180000000L)),
        FunnelUpdate(2L, Some(10 * H + 60000000L), Some(10 * H + 120000000L),
          None),
        FunnelUpdate(2L, Some(10 * H + 60000000L), Some(10 * H + 120000000L),
          Some(11 * H))))

      // final snapshots equal the batch cascade on the same events
      val batch = graft.operators.RelationalOps.funnelStages(
          all.toDF("user_id", "ts_micros", "event_type")
            .withColumn("ts", timestamp_micros(col("ts_micros"))),
          "user_id", col("ts"), col("ts_micros"), "event_type",
          Seq("view", "click", "purchase"))
        .collect().map(r => FunnelUpdate(r.getLong(0),
          Option(r.getTimestamp(1)).map(t => t.getTime * 1000L),
          Option(r.getTimestamp(2)).map(t => t.getTime * 1000L),
          Option(r.getTimestamp(3)).map(t => t.getTime * 1000L))).toSet
      val finalPerUser = Set(
        FunnelUpdate(1L, Some(10 * H), Some(10 * H + 60000000L),
          Some(10 * H + 180000000L)),
        FunnelUpdate(2L, Some(10 * H + 60000000L), Some(10 * H + 120000000L),
          Some(11 * H)))
      assert(batch === finalPerUser)
    } finally query.stop()
  }

  test("streaming windowed funnel matches the batch windowed cascade, including expired horizons and out-of-order arrival") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import StreamingOps.{FunnelEvent, FunnelUpdate}
    val M = 60L * 1000000L
    val H = 3600L * 1000000L
    val win = java.time.Duration.ofMinutes(30)
    // user 1's first purchase lands 40 min after its click — beyond the
    // 30-min window — and only a FRESH view→click→purchase run converts;
    // user 2's click arrives before its view (out-of-order within the
    // watermark) and still chains once the view folds in
    val b1 = Seq(
      FunnelEvent(1L, 10 * H, "view"),
      FunnelEvent(1L, 10 * H + 10 * M, "click"),
      FunnelEvent(2L, 10 * H + 2 * M, "click"))
    val b2 = Seq(
      FunnelEvent(1L, 10 * H + 50 * M, "purchase"), // 40 min > horizon
      FunnelEvent(2L, 10 * H + 1 * M, "view"),      // late arrival
      FunnelEvent(2L, 10 * H + 8 * M, "purchase"))
    val b3 = Seq(
      FunnelEvent(1L, 11 * H, "view"),              // fresh funnel start
      FunnelEvent(1L, 11 * H + 5 * M, "click"))
    val b4 = Seq(
      FunnelEvent(1L, 11 * H + 20 * M, "purchase")) // 15 min ≤ horizon
    val all = b1 ++ b2 ++ b3 ++ b4
    val input = MemoryStream[FunnelEvent]
    val query = StreamingOps.funnelStreamWindowed(input.toDS(), win)
      .writeStream.format("memory").queryName("funnel_win_updates")
      .outputMode("update").start()
    try {
      Seq(b1, b2, b3, b4).foreach { b =>
        input.addData(b: _*); query.processAllAvailable()
      }
      val updates = spark.table("funnel_win_updates")
        .as[FunnelUpdate].collect().toSet
      // the expired-horizon purchase never shows up in ANY snapshot
      assert(!updates.exists(_.purchase_us.contains(10 * H + 50 * M)))
      // user 1's post-b2 snapshot shows the stalled funnel
      assert(updates.contains(
        FunnelUpdate(1L, Some(10 * H), Some(10 * H + 10 * M), None)))

      // final snapshots equal the batch windowed cascade on the same rows
      val batch = graft.operators.RelationalOps.funnelStagesWindowed(
          all.toDF("user_id", "ts_micros", "event_type")
            .withColumn("ts", timestamp_micros(col("ts_micros"))),
          "user_id", col("ts"), col("ts_micros"), "event_type",
          Seq("view", "click", "purchase"), win)
        .collect().map(r => FunnelUpdate(r.getLong(0),
          Option(r.getTimestamp(1)).map(t => t.getTime * 1000L),
          Option(r.getTimestamp(2)).map(t => t.getTime * 1000L),
          Option(r.getTimestamp(3)).map(t => t.getTime * 1000L))).toSet
      assert(batch === Set(
        FunnelUpdate(1L, Some(10 * H), Some(10 * H + 10 * M),
          Some(11 * H + 20 * M)),
        FunnelUpdate(2L, Some(10 * H + 1 * M), Some(10 * H + 2 * M),
          Some(10 * H + 8 * M))))
      assert(batch.subsetOf(updates)) // stream converged to the batch truth
    } finally query.stop()
  }

  test("funnel streams: equal-timestamp events fold deterministically (ties never enable, arrival order irrelevant)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import StreamingOps.{FunnelEvent, FunnelUpdate}
    val H = 3600L * 1000000L
    // view@10H, then click and a SECOND view at the identical timestamp.
    // The tie rule (equal-ts events are causally independent, folded in
    // descending step order) means the click chains off the 10H view —
    // the tied view must NOT advance the chain target first and block it.
    // Run the same rows in both arrival orders and demand the same result.
    def run(evs: Seq[FunnelEvent], name: String): Set[FunnelUpdate] = {
      val input = MemoryStream[FunnelEvent]
      val query = StreamingOps.funnelStreamWindowed(
          input.toDS(), java.time.Duration.ofHours(24))
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        evs.foreach { e => input.addData(e); query.processAllAvailable() }
        // flusher commits everything
        input.addData(FunnelEvent(99L, 13 * H, "view"))
        query.processAllAvailable()
        input.addData(FunnelEvent(99L, 15 * H, "view"))
        query.processAllAvailable()
        spark.table(name).as[FunnelUpdate].collect().toSet
          .filter(_.user_id == 1L)
      } finally query.stop()
    }
    val evs = Seq(
      FunnelEvent(1L, 10 * H, "view"),
      FunnelEvent(1L, 11 * H, "click"),
      FunnelEvent(1L, 11 * H, "view")) // tied with the click
    val a = run(evs, "funnel_tie_a")
    val b = run(Seq(evs(0), evs(2), evs(1)), "funnel_tie_b")
    // a tie-order-sensitive fold converges to (10H, None, None) when the
    // tied view folds first; the correct machine emits the qualified
    // click in BOTH arrival orders
    val converged = FunnelUpdate(1L, Some(10 * H), Some(11 * H), None)
    assert(a.contains(converged))
    assert(b.contains(converged))
  }

  test("funnel stream: idle expiry restarts a returning user; without it state survives") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import StreamingOps.{FunnelEvent, FunnelUpdate}
    val M = 60L * 1000000L
    val H = 3600L * 1000000L
    def run(expiry: Option[java.time.Duration], name: String): Set[FunnelUpdate] = {
      val input = MemoryStream[FunnelEvent]
      val query = StreamingOps.funnelStream(input.toDS(), idleExpiry = expiry)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        // user 1 reaches view+click, then goes quiet
        input.addData(FunnelEvent(1L, 10 * H, "view"),
          FunnelEvent(1L, 10 * H + M, "click"))
        query.processAllAvailable()
        // flushers advance the watermark in stages: the first brings the
        // watermark past user 1's events; the second fires the commit
        // timeout (folding the buffer into the minima, arming the idle
        // expiry); the third fires the idle-expiry timeout itself.
        // NON-funnel type on purpose: the type filter must sit AFTER the
        // watermark node, so ongoing non-funnel traffic still advances
        // the watermark (filtering before it would stall commits and
        // expiries forever — this spec then hangs on the kept-state leg)
        input.addData(FunnelEvent(99L, 10 * H + 60 * M, "scroll"))
        query.processAllAvailable()
        input.addData(FunnelEvent(99L, 12 * H, "scroll"))
        query.processAllAvailable()
        input.addData(FunnelEvent(99L, 13 * H, "scroll"))
        query.processAllAvailable()
        // user 1 returns with a purchase (above the current watermark)
        input.addData(FunnelEvent(1L, 13 * H + M, "purchase"))
        query.processAllAvailable()
        spark.table(name).as[FunnelUpdate].collect().toSet
          .filter(_.user_id == 1L)
      } finally query.stop()
    }
    val expired = run(Some(java.time.Duration.ofMinutes(30)), "funnel_expiry")
    // state was dropped: the returning purchase found a FRESH funnel, so
    // it does not qualify and the snapshot is empty
    assert(expired.contains(FunnelUpdate(1L, None, None, None)))
    assert(!expired.exists(_.purchase_us.isDefined))
    val kept = run(None, "funnel_noexpiry")
    // without the knob the committed minima survive arbitrary quiet
    // periods and the late purchase completes the funnel
    assert(kept.contains(FunnelUpdate(1L, Some(10 * H), Some(10 * H + M),
      Some(13 * H + M))))
  }

  test("funnel stream ignores non-funnel users entirely — no rows, no state churn") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import StreamingOps.{FunnelEvent, FunnelUpdate}
    val H = 3600L * 1000000L
    val input = MemoryStream[FunnelEvent]
    val query = StreamingOps.funnelStream(input.toDS())
      .writeStream.format("memory").queryName("funnel_nonpart")
      .outputMode("update").start()
    try {
      // user 7 only ever scrolls — the batch op filters non-funnel types
      // before the cascade, so the stream must not emit all-None rows for
      // it (which would also have pinned permanent state per such user)
      input.addData(FunnelEvent(7L, 10 * H, "scroll"),
        FunnelEvent(1L, 10 * H, "view"))
      query.processAllAvailable()
      input.addData(FunnelEvent(7L, 12 * H, "scroll"),
        FunnelEvent(99L, 12 * H, "view")) // watermark flusher
      query.processAllAvailable()
      val rows = spark.table("funnel_nonpart").as[FunnelUpdate]
        .collect().toSet
      assert(!rows.exists(_.user_id == 7L), rows)
      assert(rows.exists(r => r.user_id == 1L && r.view_us.contains(10 * H)))
    } finally query.stop()
  }

  test("cohort stream: idle expiry re-anchors a returning user; without it the cohort survives") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import StreamingOps.{CohortActivity, CohortEvent}
    val H = 3600L * 1000000L
    def run(expiry: Option[java.time.Duration], name: String): Seq[CohortActivity] = {
      val input = MemoryStream[CohortEvent]
      val query = StreamingOps.cohortActivityStream(
          input.toDS(), periodSeconds = 3600L, idleExpiry = expiry)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        input.addData(CohortEvent(1L, 10 * H)) // cohort anchors at hour 10
        query.processAllAvailable()
        // flushers: advance the watermark past user 1 (commit), then past
        // the idle horizon twice so the expiry timeout fires
        for (h <- Seq(12L, 14L, 16L))
          { input.addData(CohortEvent(99L, h * H)); query.processAllAvailable() }
        input.addData(CohortEvent(1L, 20 * H)) // the user returns
        query.processAllAvailable()
        input.addData(CohortEvent(99L, 23L * H)) // commit the return
        query.processAllAvailable()
        spark.table(name).as[CohortActivity].collect().toSeq
          .filter(_.user_id == 1L).sortBy(_.period_offset)
      } finally query.stop()
    }
    val kept = run(None, "cohort_noexpiry")
    // exactly-once against the ORIGINAL anchor: offsets 0 and 10
    assert(kept.map(a => (a.cohort_start, a.period_offset)) ===
      Seq((10L * 3600L, 0L), (10L * 3600L, 10L)))
    val expired = run(Some(java.time.Duration.ofMinutes(30)), "cohort_expiry")
    // state dropped in the quiet gap: the return RE-ANCHORS as a new
    // cohort (the documented exactly-once-per-state-lifetime caveat)
    assert(expired.map(a => (a.cohort_start, a.period_offset)) ===
      Seq((10L * 3600L, 0L), (20L * 3600L, 0L)))
  }

  test("streaming retention rate (q98 twin) matches the batch rate matrix") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import StreamingOps.CohortEvent
    val S = 1000000L
    val H = 3600L * S
    val period = 300L
    // two cohorts: users 1+2 start in period 120 (user 2 retained at
    // offset 4), user 3 starts in period 124
    val evs = Seq(
      CohortEvent(1L, 10 * H + 60 * S),
      CohortEvent(2L, 10 * H + 100 * S),
      CohortEvent(2L, 10 * H + 1250 * S),
      CohortEvent(3L, 10 * H + 1210 * S))
    val input = MemoryStream[CohortEvent]
    val query = StreamingOps.cohortActivityStream(input.toDS(), period)
      .writeStream.format("memory").queryName("rr_activity")
      .outputMode("append").start()
    try {
      input.addData(evs: _*)
      query.processAllAvailable()
      input.addData(CohortEvent(99L, 11 * H)) // watermark flusher
      query.processAllAvailable()
      input.addData(CohortEvent(99L, 12 * H))
      query.processAllAvailable()
      val streamed = StreamingOps.retentionRateOf(
          spark.table("rr_activity").filter(col("user_id") =!= 99L))
        .collect().map(_.toSeq).toSet
      val batch = graft.operators.RelationalOps.retentionRateFrom(
          graft.operators.RelationalOps.cohortRetention(
            evs.toDF("user_id", "ts_micros")
              .withColumn("ts", timestamp_micros(col("ts_micros"))),
            "user_id", "ts", period))
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
      // sanity: cohort 120 has size 2 with offset-4 retention 1/2
      assert(batch.exists(r => r == Seq(120L * period, 4L, 1L, 2L, 0.5)))
    } finally query.stop()
  }

  test("streaming cohort activity: exactly-once offsets, late-first-event cohort, batch matrix parity") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import StreamingOps.{CohortEvent, CohortActivity}
    val S = 1000000L // one second in micros
    val H = 3600L * S
    val period = 300L // 5-minute periods; 10H is exactly on a boundary
    // user 1: two events in period 120 (dup offset — emitted once) and one
    // in period 124; user 2: its EARLIEST event (period 120) ARRIVES a
    // batch AFTER its period-121 event, 400 s out of order — inside the
    // 10-minute watermark, so the cohort must still anchor at period 120
    val u12 = Seq(
      CohortEvent(1L, 10 * H + 60 * S),
      CohortEvent(1L, 10 * H + 120 * S),
      CohortEvent(2L, 10 * H + 500 * S),
      CohortEvent(1L, 10 * H + 1200 * S),
      CohortEvent(2L, 10 * H + 100 * S))
    val input = MemoryStream[CohortEvent]
    val query = StreamingOps.cohortActivityStream(input.toDS(), period)
      .writeStream.format("memory").queryName("cohort_activity")
      .outputMode("append").start()
    try {
      input.addData(u12(0), u12(1), u12(2))
      query.processAllAvailable()
      input.addData(u12(3), u12(4))
      query.processAllAvailable()
      // watermark flushers: a throwaway user pushes the watermark past
      // every real row so their commits emit
      input.addData(CohortEvent(99L, 11 * H))
      query.processAllAvailable()
      input.addData(CohortEvent(99L, 12 * H))
      query.processAllAvailable()

      val stream = spark.table("cohort_activity").as[CohortActivity]
        .filter(_.user_id != 99L).collect()
      // exactly once per (user, offset)
      assert(stream.length ===
        stream.map(a => (a.user_id, a.period_offset)).distinct.length)
      val streamMatrix = stream
        .groupBy(a => (a.cohort_start, a.period_offset))
        .view.mapValues(_.length.toLong).toMap
      val batchMatrix = graft.operators.RelationalOps.cohortRetention(
          u12.toDF("user_id", "ts_micros")
            .withColumn("ts", timestamp_micros(col("ts_micros"))),
          "user_id", "ts", period)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamMatrix === batchMatrix)
      // the late-arriving earliest event anchored user 2's cohort at
      // period 120 (= 10H), not at its first-DELIVERED event's period 121
      assert(stream.filter(_.user_id == 2L).map(_.cohort_start).distinct.toSeq ===
        Seq(120L * period))
    } finally query.stop()
  }

  test("streaming gap-fill: closed periods match batch, silent periods heartbeat zeros, dead keys expire") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import StreamingOps.{GapEvent, GapFillRow}
    val S = 1000000L
    val H = 3600L * S
    val period = 300L // 5-minute periods; 10H is a boundary (36000 = 120·300)
    // key 1: data in periods 120 and 122 — 121 must heartbeat a zero row;
    // key 2: one event, then silence — heartbeats until maxSilentPeriods
    // zeros, then the state drops and emission STOPS
    val data = Seq(
      GapEvent(1L, 10 * H + 10 * S, 2.0), GapEvent(1L, 10 * H + 20 * S, 3.0),
      GapEvent(1L, 10 * H + 650 * S, 7.5),
      GapEvent(2L, 10 * H + 40 * S, 1.25))
    val input = MemoryStream[GapEvent]
    val query = StreamingOps.gapFillStream(input.toDS(), period,
        maxSilentPeriods = 2)
      .writeStream.format("memory").queryName("gapfill_stream")
      .outputMode("append").start()
    try {
      input.addData(data: _*)
      query.processAllAvailable()
      // advance the watermark far past every period either key could
      // heartbeat through (key 2 expires after 2 zeros)
      input.addData(GapEvent(99L, 13 * H, 0.0))
      query.processAllAvailable()
      input.addData(GapEvent(99L, 14 * H, 0.0))
      query.processAllAvailable()

      val rows = spark.table("gapfill_stream").as[GapFillRow]
        .filter(_.key != 99L).collect().toSet
      // key 1 matches the batch gap-fill on its closed span exactly
      val batch1 = graft.operators.RelationalOps.gapFillPeriods(
          data.filter(_.key == 1L).toDF("key", "ts_micros", "value")
            .withColumn("ts", timestamp_micros(col("ts_micros"))),
          "key", "ts", "value", period)
        .collect().map(r => GapFillRow(r.getLong(0), r.getLong(1),
          r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toSet
      val (inSpan, pastSpan) = rows.filter(_.key == 1L)
        .partition(_.win_start <= 122L * period)
      assert(inSpan === batch1) // incl. the forward-filled filled_sum
      // past its last event the key heartbeats zeros until expiry — the
      // batch op (which knows the span end) has no counterpart rows; the
      // ffill carry persists across the heartbeat zeros
      assert(pastSpan.forall(r =>
        r.cnt == 0L && r.value_sum.isEmpty && r.filled_sum.contains(7.5)))
      assert(pastSpan.size === 2)
      // key 2: its data row + exactly maxSilentPeriods zero heartbeats
      val k2 = rows.filter(_.key == 2L).toSeq.sortBy(_.win_start)
      assert(k2.head === GapFillRow(2L, 120L * period, 1L, Some(1.25), Some(1.25)))
      assert(k2.tail.map(r => (r.cnt, r.value_sum)).toSet === Set((0L, None)))
      assert(k2.size === 3) // 1 data row + 2 zeros, then the key expired
    } finally query.stop()
  }

  test("sessionize: a saturated gap never closes a session by time") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // gapMicros = Long.MaxValue is the never-close-by-time convention (the
    // funnel horizon uses the same): last + gap wrapped negative before
    // the subtraction-form fix, closing every session at the first
    // trigger after a commit
    val input = MemoryStream[StreamingOps.SessionEvent]
    val query = StreamingOps.sessionize(input.toDS(), gapMicros = Long.MaxValue)
      .writeStream.format("memory").queryName("sess_sat")
      .outputMode("append").start()
    try {
      input.addData(
        StreamingOps.SessionEvent(1L, ts("2023-01-01 10:00:00").getTime * 1000L),
        StreamingOps.SessionEvent(1L, ts("2023-01-01 10:05:00").getTime * 1000L))
      query.processAllAvailable()
      // a far-future event pushes the watermark way past both commits
      input.addData(
        StreamingOps.SessionEvent(99L, ts("2024-01-01 00:00:00").getTime * 1000L))
      query.processAllAvailable()
      // user 1's session must still be OPEN: no time horizon can pass a
      // saturated gap, so nothing is emitted for it
      assert(spark.table("sess_sat").filter(col("user_id") === 1L).count() === 0)
    } finally query.stop()
  }

  test("funnel streams reject duplicate step names like the batch twins") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[StreamingOps.FunnelEvent]
    val e = intercept[IllegalArgumentException](
      StreamingOps.funnelStream(input.toDS(), steps = ("add", "add", "buy")))
    assert(e.getMessage.contains("duplicate step names"))
    val e2 = intercept[IllegalArgumentException](
      StreamingOps.funnelStreamWindowed(input.toDS(),
        java.time.Duration.ofMinutes(5), steps = ("x", "y", "x")))
    assert(e2.getMessage.contains("duplicate step names"))
  }

  test("gapFillStream: a late-only key emits nothing and leaves no heartbeat") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val period = 60L
    val input = MemoryStream[StreamingOps.GapEvent]
    val query = StreamingOps.gapFillStream(input.toDS(), period,
      maxSilentPeriods = 2, delay = "10 minutes")
      .writeStream.format("memory").queryName("gap_late_only")
      .outputMode("append").start()
    try {
      // key 9 advances the watermark far into the future
      input.addData(StreamingOps.GapEvent(9L,
        ts("2023-06-01 00:00:00").getTime * 1000L, 1.0))
      query.processAllAvailable()
      // key 1 arrives entirely BEHIND the watermark: dropped as late; the
      // no-state guard must not create a zombie entry whose wm+1 timeout
      // re-fires forever
      input.addData(StreamingOps.GapEvent(1L,
        ts("2023-01-01 00:00:00").getTime * 1000L, 5.0))
      query.processAllAvailable()
      // several more watermark advances: a zombie key-1 state would keep
      // fn firing; correct behavior is zero key-1 rows ever
      input.addData(StreamingOps.GapEvent(9L,
        ts("2023-06-01 01:00:00").getTime * 1000L, 1.0))
      query.processAllAvailable()
      assert(spark.table("gap_late_only").filter(col("key") === 1L).count() === 0)
    } finally query.stop()
  }
}
