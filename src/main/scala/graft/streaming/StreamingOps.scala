package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators: event-time windowed aggregation with
  * watermarks (the streaming twin of the batch weekly agg) and stateful
  * gap-based sessionization via `flatMapGroupsWithState`.
  *
  * Everything here consumes any streaming DataFrame (`readStream` file
  * source, Kafka, or MemoryStream in tests) — the transformations are
  * source-agnostic, as Structured Streaming intends.
  */
object StreamingOps {

  /** Monday-aligned weekly tumbling window. `window()` aligns its grid to
    * the epoch (1970-01-01, a THURSDAY) — the 4-day `startTime` shifts the
    * 7-day grid onto Mondays so results match `date_trunc("week", ts)`
    * exactly (verified in StreamingOpsSpec).
    */
  def weeklyWindow(ts: Column): Column =
    window(ts, "7 days", "7 days", "4 days")

  /** Streaming weekly aggregate keyed like the batch trades pipeline
    * (`graft.etl.Transform.weeklyAgg`): conditional buy/sell split in a
    * single grouped pass. Watermark bounds state: windows older than
    * `delayThreshold` past the max seen event time are finalized and
    * dropped from the state store.
    */
  def weeklyTradesAgg(trades: DataFrame, delayThreshold: String = "7 days"): DataFrame = {
    val aggs = graft.etl.Transform.pnlAggExprs // same exprs as the batch agg
    trades
      .withWatermark("timestamp", delayThreshold)
      .withColumn("total_volume", col("quantity") * col("price"))
      .groupBy(
        weeklyWindow(col("timestamp")).as("week"),
        col("client_type"), col("user_id"), col("symbol"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("week_start_date", col("week.start").cast("date"))
      .drop("week")
  }

  /** Streaming exact deduplication by content fingerprint: state holds one
    * entry per fingerprint seen within the watermark horizon, so duplicate
    * documents arriving late (up to `delay`) are still dropped while state
    * stays bounded — the streaming twin of the batch `q20_dedup_exact`.
    */
  def dedupStream(
      docs: DataFrame,
      fingerprint: Column,
      eventTime: String,
      delay: String = "1 hour"): DataFrame =
    // reserved "__fp" name + drop: a caller column named "fingerprint" (a
    // plausible name in content pipelines) must be neither clobbered nor
    // shadowed, and the synthetic dedup key must not leak into the output
    docs
      .withColumn("__fp", fingerprint)
      .withWatermark(eventTime, delay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Stream-stream interval join (click attribution): purchases join the
    * clicks of the same user within the preceding `window`. Watermarks on
    * BOTH sides + the time-range predicate let Spark expire join state —
    * unbounded streams, bounded memory.
    */
  /** `joinType = "left_outer"` additionally emits click-less purchases
    * (click_id NULL) once the watermark passes their join window — exactly
    * the rows a marketing pipeline writes off as organic.
    */
  def attributionJoin(
      purchases: DataFrame, clicks: DataFrame,
      window: String = "1 hour", delay: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_time"))
      .withWatermark("p_time", delay)
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_time"))
      .withWatermark("c_time", delay)
    p.join(c,
      col("user_id") === col("c_user") &&
        col("c_time") >= col("p_time") - expr(s"INTERVAL $window") &&
        col("c_time") < col("p_time"),
      joinType)
      .select("purchase_id", "click_id", "user_id", "p_time", "c_time")
  }

  /** Keyed-upsert sink via `foreachBatch` — the reference's own README
    * lists "keyed upsert instead of blind append" as future work
    * (`/root/reference/README.md:46`); this is that operation for a
    * parquet table without a lakehouse format: each micro-batch is merged
    * into the target by key, keeping the batch's row on conflict.
    * At real scale the same `foreachBatch` body would be a Delta/Iceberg
    * MERGE; the streaming-side shape (update-mode agg → merge per batch)
    * is identical.
    */
  def upsertSink(
      agg: DataFrame, keys: Seq[String], path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    agg.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // update-mode aggregation emits at most one row per updated key and
        // micro-batch; the dropDuplicates is a safeguard for that contract,
        // NOT a latest-wins reduction (feed aggregated state, not raw rows)
        val deduped = batch.dropDuplicates(keys)
        // existence via the path's own FileSystem — java.io.File would be
        // always-false on hdfs:///s3a:// and silently overwrite the table.
        // TableSwap.replace runs crash recovery FIRST, so this check and
        // the merge read see the restored table; a failed rename/delete
        // throws, failing the micro-batch so the checkpoint retries it.
        val hPath = new org.apache.hadoop.fs.Path(path)
        val fs    = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        graft.sources.TableSwap.replace(spark, path) { staging =>
          val merged =
            if (fs.exists(hPath)) {
              // null-SAFE anti-join (<=>): a plain key equi-join never
              // matches NULL key values, so a null-keyed group's stale row
              // would survive every merge and the table would accrete one
              // duplicate per touching batch (dropDuplicates above treats
              // null keys as equal — the merge must agree)
              val newKeys = deduped.select(
                keys.map(c => col(c).as(s"__new_$c")): _*)
              val cond = keys.map(k => col(k) <=> col(s"__new_$k"))
                .reduce(_ && _)
              spark.read.parquet(path)
                .join(newKeys, cond, "left_anti")
                .unionByName(deduped)
            } else deduped
          merged.write.mode("overwrite").parquet(staging)
        }
        ()
      }
      .start()

  /** Streaming vocabulary maintenance: running term counts over a document
    * stream — the incremental twin of the batch vocab build (q52). State is
    * one row per distinct term; the term universe is bounded (a vocabulary,
    * not a corpus), so complete-mode output stays cheap and a downstream
    * consumer applies the same top-k/dense-id cut as the batch path.
    * Parity with batch counts on the same rows is spec-asserted.
    */
  def termCounts(docs: DataFrame): DataFrame =
    graft.queries.TextQueries.termCountsOf(docs) // shared counting stage

  /** Streaming twin of the q84 incremental admission dedup: a document
    * STREAM admitted against a static accumulated corpus. Entirely
    * STATELESS — the three checks are stream-static left joins against
    * precomputed base-side tables (exact fingerprints; per-band kept
    * buckets under the same hot-bucket cap as batch), and each join key is
    * unique on the static side so the joins are row-preserving. A doc is
    * admitted iff no check hit — bit-identical to the batch
    * [[graft.queries.TextQueries.incrementalDedup]] contract
    * (parity spec-asserted), including within-batch duplicates being
    * admitted: admission compares against the BASE, not the stream.
    *
    * The static tables are PERSISTED at stream start: a stream-static
    * join re-evaluates the static subplan on EVERY micro-batch, so
    * without the persist each trigger would pay a full base-corpus scan
    * plus the signature/banding shuffle. The cache lives as long as the
    * session (these are the per-stream index tables); in production they
    * are the incrementally-maintained fingerprint/bucket tables,
    * refreshed by restarting the query (or a `foreachBatch` re-read) on
    * the admission cadence.
    */
  def admissionDedupStream(docs: DataFrame, base: DataFrame): DataFrame = {
    import graft.queries.TextQueries
    val baseFps = base
      .select(graft.functions.TextOps.fingerprintMd5(col("text")).as("__fp"))
      .distinct().withColumn("__fphit", lit(1))
      .persist()
    val kept = TextQueries.keptBaseBuckets(base).persist()
    val b0 = kept.filter(col("band") === 0)
      .select(col("key").as("__k0"), lit(1).as("__hit0"))
    val b1 = kept.filter(col("band") === 1)
      .select(col("key").as("__k1"), lit(1).as("__hit1"))
    TextQueries.withSignatures(docs)
      .withColumn("__fp", graft.functions.TextOps.fingerprintMd5(col("text")))
      .withColumn("__k0", concat(col("sig0"), col("sig1")))
      .withColumn("__k1", concat(col("sig2"), col("sig3")))
      .join(baseFps, Seq("__fp"), "left")
      .join(b0, Seq("__k0"), "left")
      .join(b1, Seq("__k1"), "left")
      .filter(col("__fphit").isNull && col("__hit0").isNull && col("__hit1").isNull)
      .drop("sig0", "sig1", "sig2", "sig3",
        "__fp", "__k0", "__k1", "__fphit", "__hit0", "__hit1")
  }

  /** Streaming twin of the q61 training-data export: documents are scored
    * (token count, quality, language — all narrow per-row expressions,
    * shared with the batch path via TextOps), exact-deduped within the
    * watermark horizon by content fingerprint, quality-filtered, and
    * joined stream-static against the int8-quantized embedding codes (the
    * q55 family, shared via `withInt8Codes`). Emits the shipped artifact
    * incrementally as documents arrive.
    *
    * Contract difference vs batch q61, by design: dedup here is EXACT
    * (q20 semantics, first-arrival-wins within the watermark) — near-dup
    * CLUSTER dedup needs the corpus-wide connected components, which is a
    * batch recompaction step; its streaming precursor is
    * [[neardupCandidates]] feeding a periodic batch clustering.
    */
  /** `shardAssign` appends the q86 shuffle_key + shard columns (pure
    * per-row projections — stateless) so the streamed artifact lands
    * pre-routed for a sharded training consumer; the KEY-SORTED file
    * rewrite ([[graft.sources.ShuffledShards.writeShuffled]]) remains a
    * batch compaction step — a stream cannot globally sort, but because
    * key and shard are deterministic functions of doc_id, the later
    * compaction reproduces exactly the order this stream's keys declare.
    */
  def trainingExportStream(
      docs: DataFrame, staticEmb: DataFrame,
      eventTime: String = "event_time", delay: String = "1 hour",
      minQuality: Double = 0.5,
      sampleRates: Map[String, Double] = Map.empty,
      piiRedact: Boolean = false,
      shardAssign: Boolean = false): DataFrame = {
    // PII scrub is a pure per-row projection (q79) — stateless in a
    // stream; runs FIRST so the dedup fingerprint hashes redacted text,
    // same order as the batch pipeline
    val scrubbed =
      if (piiRedact) graft.queries.TextQueries.piiRedactText(docs) else docs
    val deduped = scrubbed
      .withColumn("__fp", graft.functions.TextOps.fingerprintMd5(col("text")))
      .withWatermark(eventTime, delay)
      .dropDuplicatesWithinWatermark("__fp")
    // scoring + codes are the SAME definitions the batch export composes
    val kept = graft.queries.TextQueries.scoreDocs(deduped)
      .filter(col("quality") >= minQuality)
    // mixture sampling is a pure per-row predicate (q73) — stateless in a
    // stream, identical keep-set to the batch pipeline by construction
    val sampled =
      if (sampleRates.isEmpty) kept
      else graft.queries.TextQueries.mixtureSample(
        kept, sampleRates, langCol = "lang_pred").drop("sample_key")
    val joined = sampled.join(
      // persisted: quantization is narrow but corpus-sized — a per-trigger
      // recompute of the whole static embedding table is pure waste
      graft.queries.VectorQueries.codesCsvByDocId(staticEmb).persist(),
      Seq("doc_id")) // stream-static equi-join, no state
    if (!shardAssign) joined
    else joined
      .withColumn("shuffle_key", graft.queries.TextQueries.shuffleKeyCol)
      .withColumn("shard", graft.queries.TextQueries.shardOfKey(col("shuffle_key")))
  }

  /** Streaming twin of the q89 importance scorer — the standard DSIR
    * deployment shape: the (≤256-row) weight table is trained ONCE on a
    * batch reference snapshot ([[graft.queries.TextQueries
    * .importanceWeightsOf]]), frozen, and every arriving document is
    * scored against it as a pure per-row fold (bucket each token, map
    * lookup, left-to-right sum) — stateless, zero shuffles, so the scores
    * are bit-identical to running the batch scorer over the same docs
    * with the same frozen table (parity-spec'd). Retraining the weights
    * is a periodic batch job, exactly like the near-dup recompaction.
    */
  def importanceScoreStream(docs: DataFrame, staticWeights: DataFrame): DataFrame = {
    val w = staticWeights.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.filter(col("text").isNotNull)
      .withColumn("score",
        graft.queries.TextQueries.importanceScoreCol(col("text"), w))
      .withColumn("n_tokens",
        graft.functions.TextOps.tokenCount(col("text")).cast("long"))
  }

  // ---- streaming near-duplicate candidates ------------------------------

  case class BandedDoc(band: Int, key: String, doc_id: Long, event_us: Long)

  case class BucketState(docs: List[(Long, Long)]) // (doc_id, event_us)

  case class NeardupCandidate(doc_a: Long, doc_b: Long, band: Int)

  /** Streaming twin of the batch LSH near-dup candidate generator (q22):
    * documents are MinHash-signed and banded as they arrive (narrow, per
    * row); state keyed by (band, key) holds the bucket's doc ids seen
    * within the watermark horizon, so each new document emits a candidate
    * pair against every bucket-mate no older than `delay` — then expires.
    * Unbounded stream, bounded state.
    *
    * Contract differences vs the batch form, both resolved by the Jaccard
    * verify stage downstream: a pair colliding in both bands is emitted
    * per band (the batch form dedups), and the hot-bucket guard DROPS
    * documents once a bucket holds `maxBucket` live entries (the batch
    * form skips the whole bucket).
    */
  def neardupCandidates(
      docs: DataFrame,
      eventTime: String = "event_time",
      delay: String = "1 hour",
      maxBucket: Int = 1000): Dataset[NeardupCandidate] =
    candidatesFromBanded(
      graft.queries.TextQueries.withSignatures(docs)
        .select(col("doc_id"), col(eventTime),
          graft.queries.TextQueries.bandsExploded.as(Seq("band", "key"))),
      eventTime, delay, maxBucket)

  /** Streaming twin of the batch simhash banded pair generator (q64): the
    * 64-bit simhash is a single narrow codegen'd expression per document,
    * its 4×16-bit bands feed the SAME bucket-state machinery as the
    * MinHash twin — only the fingerprint family differs. Downstream, a
    * verify stage joins fingerprints back and filters `hamming ≤ 3`
    * exactly as the batch q64 does.
    */
  def simhashCandidates(
      docs: DataFrame,
      eventTime: String = "event_time",
      delay: String = "1 hour",
      maxBucket: Int = 1000): Dataset[NeardupCandidate] = {
    val sh = graft.queries.TextQueries.simhashCol
    candidatesFromBanded(
      docs
        .withColumn("__sh", sh)
        .filter(col("__sh").isNotNull)
        .select(col("doc_id"), col(eventTime),
          posexplode(array((0 to 3).map(j =>
            format_string("%04x", shiftright(col("__sh"), 16 * j)
              .bitwiseAND(lit(0xFFFFL)))): _*)).as(Seq("band", "key"))),
      eventTime, delay, maxBucket)
  }

  /** Streaming simhash EXACT-fingerprint dedup (the Hamming-0 tier of the
    * q64 family): one state entry per distinct simhash within the
    * watermark horizon, first arrival wins — `dedupStream` with the
    * simhash expression as the fingerprint.
    */
  def simhashDedupStream(
      docs: DataFrame,
      eventTime: String = "event_time",
      delay: String = "1 hour"): DataFrame =
    dedupStream(docs, graft.queries.TextQueries.simhashCol, eventTime, delay)

  /** Streaming image near-dup candidates over the 64-bit dHash
    * ([[graft.multimodal.MediaDecode]]): each micro-batch decodes its
    * images in a narrow per-partition stage (undecodable media drops out,
    * never fails the query), and the hash's 4×16-bit bands feed the SAME
    * bucket-state machinery as the MinHash/simhash twins — re-encoded or
    * gamma-shifted copies of a crawled image surface as candidates within
    * the watermark horizon. Downstream verify = per-pair `bit_count(xor)`
    * exactly like the batch
    * [[graft.multimodal.MediaDecode.imageNearDupPairs]].
    */
  def imageNeardupCandidates(
      media: DataFrame, // doc_id, bytes, event_time
      eventTime: String = "event_time",
      delay: String = "1 hour",
      maxBucket: Int = 1000): Dataset[NeardupCandidate] = {
    import media.sparkSession.implicits._
    val hashed = media
      .select(col("doc_id"), col(eventTime).as("__t"), col("bytes"))
      .as[(Long, java.sql.Timestamp, Array[Byte])]
      .mapPartitions(_.map { case (id, t, b) =>
        (id, t, Option(b).flatMap(graft.multimodal.MediaDecode.dhash64))
      })
      .toDF("doc_id", eventTime, "dhash")
      .filter(col("dhash").isNotNull)
    candidatesFromBanded(
      hashed.select(col("doc_id"), col(eventTime),
        posexplode(array((0 to 3).map(j =>
          format_string("%04x", shiftright(col("dhash"), 16 * j)
            .bitwiseAND(lit(0xFFFFL)))): _*)).as(Seq("band", "key"))),
      eventTime, delay, maxBucket)
  }

  /** Streaming twin of the q72 duplicated-passage detector: each arriving
    * document's DISTINCT word 10-gram hashes probe bucket state keyed by
    * the gram hash itself (band constant — the passage hash is the only
    * banding family), emitting a candidate pair per bucket-mate within the
    * watermark horizon. Same contract split as [[neardupCandidates]]: the
    * per-doc duplicated-position FRACTIONS (batch q72) need corpus-wide
    * document frequencies, which remain a periodic batch recompaction this
    * stream feeds.
    */
  def dupPassageCandidates(
      docs: DataFrame,
      eventTime: String = "event_time",
      delay: String = "1 hour",
      maxBucket: Int = 1000): Dataset[NeardupCandidate] = {
    import graft.functions.TextOps
    val n = graft.queries.TextQueries.dupPassageGramN
    candidatesFromBanded(
      docs
        .withColumn("__toks", TextOps.tokens(TextOps.normalized(col("text"))))
        .withColumn("key",
          explode(array_distinct(transform(
            TextOps.wordGramsWithRepeats(col("__toks"), n),
            g => substring(md5(g), 1, 16)))))
        .select(col("doc_id"), col(eventTime), lit(0).as("band"), col("key")),
      eventTime, delay, maxBucket)
  }

  /** Streaming twin of the q77 chunk-level dedup: each arriving document
    * explodes into its CDC chunks (narrow codegen'd kernel, edit-stable
    * boundaries), and chunk FINGERPRINTS dedup within the watermark
    * horizon — first arrival wins, the exact-dedup contract lifted from
    * documents to chunks. Emits surviving (doc_id, chunk_start, chunk_len,
    * chunk_fp) rows; offset-order reassembly (and the corpus-wide argmin
    * canonicalization) stays a batch step, same contract split as the
    * candidate streams.
    */
  def chunkDedupStream(
      docs: DataFrame,
      eventTime: String = "event_time",
      delay: String = "1 hour"): DataFrame =
    graft.queries.TextQueries.cdcChunksOf(docs, keep = Seq(eventTime))
      .withWatermark(eventTime, delay)
      .dropDuplicatesWithinWatermark("chunk_fp")

  /** Streaming twin of the q68 contamination detector: each arriving
    * training document's word 13-grams probe the STATIC eval-set gram
    * table (broadcast — a benchmark is bounded, like the ANN codebooks),
    * and the first matching gram per document emits one alert row; state
    * is the per-doc dedup within the watermark horizon. The APPLY (q69)
    * stays a batch step by design — removing a doc needs its complete
    * absence from the hit set, which this stream feeds; same contract
    * split as [[neardupCandidates]] vs the periodic batch clustering.
    */
  def contaminationAlerts(
      docs: DataFrame, evalDocs: DataFrame,
      eventTime: String = "event_time", delay: String = "1 hour"): DataFrame = {
    import graft.functions.TextOps
    val n = graft.queries.TextQueries.decontamGramN
    // persisted: the stream-static join re-evaluates (and re-broadcasts)
    // the static side per micro-batch — the gram explode over the eval
    // set must not be recomputed on every trigger
    val evalGrams = graft.queries.TextQueries.docGrams(evalDocs, n)
      .select(col("doc_id").as("eval_id"), col("gram"))
      .persist()
    docs
      .withColumn("__toks", TextOps.tokens(TextOps.normalized(col("text"))))
      .withColumn("gram",
        explode(TextOps.wordShinglesFromTokens(col("__toks"), n)))
      .withWatermark(eventTime, delay)
      .join(broadcast(evalGrams), "gram") // stream-static, stateless
      .select(col("doc_id"), col(eventTime), col("gram"), col("eval_id"))
      .dropDuplicatesWithinWatermark("doc_id")
  }

  /** The shared bucket-state engine behind both candidate generators:
    * input must carry (doc_id, `eventTime`, band, key) — one row per
    * (document, band). NULL keys are dropped (a NULL fingerprint never
    * pairs).
    */
  private def candidatesFromBanded(
      banded: DataFrame,
      eventTime: String,
      delay: String,
      maxBucket: Int): Dataset[NeardupCandidate] = {
    import banded.sparkSession.implicits._
    val interval = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(delay))
    require(interval.months == 0, "candidatesFromBanded: delay must be day-time")
    val horizonMs = interval.days * 86400000L + interval.microseconds / 1000L

    def fn(
        bucket: (Int, String),
        rows: Iterator[BandedDoc],
        state: GroupState[BucketState]): Iterator[NeardupCandidate] = {
      val sorted = rows.toSeq.sortBy(d => (d.event_us, d.doc_id))
      var docsInBucket = state.getOption.map(_.docs).getOrElse(Nil)
      val out = Seq.newBuilder[NeardupCandidate]

      val cutoffUs = (state.getCurrentWatermarkMs() - horizonMs) * 1000L
      def prune(): Unit =
        docsInBucket = docsInBucket.filter(_._2 >= cutoffUs)

      if (sorted.isEmpty) prune() // event-time timeout fired
      else {
        prune()
        // size and membership carried incrementally: per-row List.size +
        // List.exists are O(bucket) each, and a saturated stop-bucket
        // (boilerplate flood — the exact case the cap protects) would pay
        // ~2*maxBucket pointer-chases per SKIPPED row
        var n = docsInBucket.size
        val ids = scala.collection.mutable.HashSet.empty[Long]
        docsInBucket.foreach(ids += _._1)
        sorted.foreach { d =>
          // at-least-once sources re-deliver: a doc_id already in state is
          // skipped entirely — re-inserting would re-emit its pairs AND
          // burn a hot-bucket cap slot a distinct document needs. The
          // cutoff guard applies the same rule to a doc re-delivered
          // AFTER its horizon expired (prune already dropped it, so the
          // in-state check alone can't catch it): inserting it would
          // re-emit beyond-horizon pairs and burn a cap slot until the
          // next prune.
          if (d.event_us >= cutoffUs && n < maxBucket &&
              !ids.contains(d.doc_id)) {
            docsInBucket.foreach { case (otherId, _) =>
              out += NeardupCandidate(
                math.min(otherId, d.doc_id), math.max(otherId, d.doc_id),
                bucket._1)
            }
            docsInBucket = (d.doc_id, d.event_us) :: docsInBucket
            n += 1; ids += d.doc_id
          } // else: duplicate delivery, or stop-bucket boilerplate flood
        }
      }

      if (docsInBucket.isEmpty) state.remove()
      else {
        state.update(BucketState(docsInBucket))
        // wake when the OLDEST live doc leaves the horizon; clamp above the
        // watermark (a timeout at/behind it kills the query)
        val oldestMs = docsInBucket.map(_._2).min / 1000L
        state.setTimeoutTimestamp(math.max(
          oldestMs + horizonMs + 1L, state.getCurrentWatermarkMs() + 1L))
      }
      out.result().iterator
    }

    banded
      .filter(col("key").isNotNull)
      .withWatermark(eventTime, delay)
      .withColumn("event_us", unix_micros(col(eventTime)))
      .as[BandedDoc]
      .groupByKey(d => (d.band, d.key))
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)
  }

  // ---- stateful sessionization ------------------------------------------

  case class SessionEvent(user_id: Long, ts_micros: Long)

  /** Per-user sessionize state: the open session (`start = -1` ⇒ none)
    * plus the not-yet-committed buffer of event timestamps at/above the
    * watermark (the funnelMachine discipline).
    *
    * The -1 sentinels here (and in the funnel/cohort/gap-fill states)
    * cannot collide with real data: committed timestamps are always ≥ some
    * earlier watermark, and Spark watermarks are non-negative — so
    * PRE-EPOCH event times never commit; they are dropped as late rows at
    * the `>= wmUs` gate (watermark floor 0). Historical pre-1970 backfills
    * belong on the batch twins, which handle them explicitly.
    */
  case class SessionState(
      start: Long, last: Long, events: Int, buffer: List[Long])

  case class SessionOut(
      user_id: Long,
      session_start_us: Long,
      session_end_us: Long,
      n_events: Int)

  /** Gap-based sessionization over an unbounded stream: per-user state
    * carries the open session; an event past the gap (or the watermark
    * passing last+gap) closes it. Emits one row per CLOSED session — the
    * streaming counterpart of
    * [[graft.operators.RelationalOps.sessionize]].
    *
    * Same watermark/buffer contract as [[funnelMachine]]: the gap fold is
    * order-sensitive, so events at/above the watermark wait in a per-user
    * BUFFER and only fold into the open session (in timestamp order —
    * exactly the batch fold) once the watermark passes them and nothing
    * earlier can still arrive; rows behind the watermark are dropped (a
    * late straggler must not re-open a closed session —
    * `flatMapGroupsWithState` does not drop them for us). The closed-
    * session set therefore equals batch [[graft.operators.RelationalOps
    * .sessionize]] over the in-watermark events, for ANY arrival order.
    * A session closes as soon as the watermark passes last+gap: every
    * event that could still arrive (and everything buffered) is ≥ the
    * watermark > last+gap, i.e. past the gap by construction.
    */
  def sessionize(
      events: Dataset[SessionEvent],
      gapMicros: Long,
      delay: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._

    def fn(
        userId: Long,
        rows: Iterator[SessionEvent],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val prev = state.getOption.getOrElse(SessionState(-1L, -1L, 0, Nil))
      val closed = Seq.newBuilder[SessionOut]

      // merge buffer + fresh in-watermark rows; commit what the watermark
      // has passed, in ts order — the batch fold over a monotone sequence
      val fresh = rows.map(_.ts_micros).filter(_ >= wmUs).toList
      val merged = (prev.buffer ++ fresh).sorted
      val (commit, keep) = merged.partition(_ < wmUs)
      var (start, last, n) = (prev.start, prev.last, prev.events)
      commit.foreach { ts =>
        if (start < 0) { start = ts; last = ts; n = 1 }
        else if (ts - last <= gapMicros) { last = ts; n += 1 }
        else {
          closed += SessionOut(userId, start, last, n)
          start = ts; last = ts; n = 1
        }
      }
      // the watermark passing last+gap proves no in-gap event can arrive:
      // buffered and future events are ≥ wm > last+gap. SUBTRACTION form:
      // `wmUs > last + gapMicros` wraps negative for a saturated gap
      // (gapMicros = Long.MaxValue is the never-close-by-time convention
      // the funnel horizon uses) and would close every session at the
      // first trigger — the same wrap the batch twin documents fixing
      // (RelationalOps.sessionize).
      if (start >= 0 && wmUs - last > gapMicros) {
        closed += SessionOut(userId, start, last, n)
        start = -1L; last = -1L; n = 0
      }

      if (start < 0 && keep.isEmpty) state.remove()
      else {
        state.update(SessionState(start, last, n, keep))
        // wake when the watermark passes the oldest buffered event or the
        // open session's gap horizon, whichever first; clamp above the
        // current watermark (a timeout at/behind it kills the query).
        // Saturating add: last + Long.MaxValue would wrap negative and arm
        // a perpetual every-trigger wm+1 timeout.
        val gapHorizon =
          if (gapMicros > Long.MaxValue - math.max(last, 0L)) Long.MaxValue
          else last + gapMicros
        val wakeMs = math.min(
          keep.headOption.map(_ / 1000L + 1L).getOrElse(Long.MaxValue),
          if (start >= 0) gapHorizon / 1000L + 1L else Long.MaxValue)
        state.setTimeoutTimestamp(math.max(
          wakeMs, state.getCurrentWatermarkMs() + 1L))
      }
      closed.result().iterator
    }

    events
      .withColumn("event_time", timestamp_micros(col("ts_micros")))
      .withWatermark("event_time", delay)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)
  }

  // ---- streaming ordered funnel -----------------------------------------

  case class FunnelEvent(user_id: Long, ts_micros: Long, event_type: String)

  case class FunnelUpdate(
      user_id: Long,
      view_us: Option[Long],
      click_us: Option[Long],
      purchase_us: Option[Long])

  /** Per-user state of the funnel streams: committed earliest qualifying
    * timestamps (`minima`, the output; -1 = unreached) plus committed
    * LATEST qualifying timestamps (`lasts`, what the next step's
    * qualifying predicate chains off); `buffer` holds the
    * not-yet-committed out-of-order tail, (ts, type) pairs newer than the
    * watermark.
    */
  case class FunnelWinState(
      minima: Seq[Long], lasts: Seq[Long], buffer: List[(Long, String)])

  /** The ONE stateful machine behind [[funnelStream]] and
    * [[funnelStreamWindowed]] (they differ only in `horizonUs`): per-user
    * state, batch parity under the watermark contract. The batch cascades
    * are order-sensitive — a view arriving late can re-qualify a click
    * that was already seen — so the state cannot be just the per-step
    * extremes: events newer than the watermark stay in a per-user BUFFER
    * and are only folded into the committed state (in timestamp order,
    * which makes the fold exactly the batch cascade) once the watermark
    * passes them and no earlier event can still arrive. Each trigger
    * emits the user's current funnel snapshot — committed minima plus a
    * provisional fold of the buffer — so the sink sees Update-mode rows
    * whose final value per user equals the batch result (parity-spec'd,
    * including out-of-order arrival). Events later than the watermark
    * itself are dropped (the watermark contract;
    * `flatMapGroupsWithState` does not drop them for us).
    *
    * The fold chains step i off the LATEST qualifying step-(i−1)
    * timestamp with a strict `>` plus the horizon bound. With
    * `horizonUs = Long.MaxValue` this is provably the same emitted
    * minima as [[graft.operators.RelationalOps.funnelStages]]'s
    * min-cascade: both qualifying predicates reduce to "∃ a qualifying
    * step-(i−1) event strictly earlier" (induction per step — the
    * running min is < ts exactly when the running max is), so one
    * machine serves both semantics.
    *
    * EQUAL timestamps fold in descending step order, making simultaneous
    * events causally independent: a same-ts predecessor never enables a
    * successor (consistent with the strict `>` rule), and the outcome is
    * deterministic whatever order events arrive — `flatMapGroupsWithState`
    * guarantees no within-group order. This matches the batch operators
    * with a tieBreaker that orders equal-ts rows by descending step
    * index; under other tieBreakers (e.g. q97's event_id) batch and
    * stream can legitimately differ on exact-tie inputs.
    *
    * An event-time timeout commits a quiet user's buffered tail once the
    * watermark passes it (without one the tail would stay provisional
    * forever and state would grow with user cardinality); `idleExpiry`
    * additionally drops a user's state after that long with nothing
    * buffered — bounding state for abandoned users at the cost of parity
    * for users who return after the expiry (their funnel restarts).
    */
  private def funnelMachine(
      events: Dataset[FunnelEvent],
      stepSeq: Vector[String],
      horizonUs: Long,
      idleExpiry: Option[java.time.Duration],
      delay: String): Dataset[FunnelUpdate] = {
    import events.sparkSession.implicits._
    // the batch twins (funnelStages/funnelStagesWindowed) fail fast on
    // duplicate step names; without this a duplicate silently makes the
    // later step unreachable (indexOf resolves every occurrence to the
    // first) and the stream reports None forever instead of erroring
    require(stepSeq.distinct.size == stepSeq.size,
      s"duplicate step names: ${stepSeq.mkString(", ")}")

    def fold(st: (Vector[Long], Vector[Long]),
        e: (Long, String)): (Vector[Long], Vector[Long]) = {
      val (mins, lasts) = st
      val (ts, typ) = e
      val i = stepSeq.indexOf(typ)
      if (i < 0) st
      else {
        val qual = i == 0 ||
          (lasts(i - 1) >= 0 && ts > lasts(i - 1) &&
            ts - lasts(i - 1) <= horizonUs)
        if (!qual) st
        else (if (mins(i) >= 0) mins else mins.updated(i, ts),
          lasts.updated(i, ts))
      }
    }

    def fn(
        userId: Long,
        rows: Iterator[FunnelEvent],
        state: GroupState[FunnelWinState]): Iterator[FunnelUpdate] = {
      val prev = state.getOption.getOrElse(
        FunnelWinState(Vector.fill(3)(-1L), Vector.fill(3)(-1L), Nil))
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      // idle-expiry firing with nothing buffered: drop the long-dead
      // user's state. Parity caveat (documented above): if the user
      // re-appears, their funnel restarts from scratch.
      if (state.hasTimedOut && prev.buffer.isEmpty && rows.isEmpty &&
          idleExpiry.isDefined) {
        state.remove()
        return Iterator.empty
      }
      val fresh = rows.map(e => (e.ts_micros, e.event_type))
        .filter(e => e._1 >= wmUs && stepSeq.contains(e._2)).toList
      // sort ONCE over the merged tail: (ts, DESCENDING step) — the tie
      // rule above. Arrival order must never matter.
      val merged = (prev.buffer ++ fresh)
        .sortBy(e => (e._1, -stepSeq.indexOf(e._2)))
      val (commit, keep) = merged.partition(_._1 < wmUs)
      // nothing usable and no state yet (non-funnel-only user, or every
      // row late-dropped): emit nothing and — critically — create no
      // state. This guard, not a Dataset-level type filter, is what keeps
      // non-participants out of the store: a `filter(isin(steps))` before
      // groupByKey gets PUSHED BELOW the watermark node by Catalyst (the
      // predicate doesn't reference event_time), so only funnel-type rows
      // would advance the watermark and a stream of mostly non-funnel
      // traffic would never commit buffered tails or fire idle expiries
      // (caught by the scroll-flusher expiry spec).
      if (!state.exists && commit.isEmpty && keep.isEmpty)
        return Iterator.empty
      val committed = commit.foldLeft(
        (prev.minima.toVector, prev.lasts.toVector))(fold)
      state.update(FunnelWinState(committed._1, committed._2, keep))
      // a group only re-enters fn on new data OR a timeout — without one,
      // a quiet user's buffered out-of-order tail would stay provisional
      // forever (the advisor's round-6 finding). Fire when the watermark
      // passes the oldest buffered event (clamped above the current
      // watermark, the sessionize rule); with an empty buffer, arm the
      // optional idle expiry instead so long-dead users' state is freed.
      if (keep.nonEmpty)
        state.setTimeoutTimestamp(math.max(
          keep.head._1 / 1000L + 1L, state.getCurrentWatermarkMs() + 1L))
      else idleExpiry.foreach(d => state.setTimeoutTimestamp(
        state.getCurrentWatermarkMs() + math.max(d.toMillis, 1L)))
      val provisional = keep.foldLeft(committed)(fold)._1
      def opt(v: Long) = if (v >= 0) Some(v) else None
      Iterator.single(FunnelUpdate(
        userId, opt(provisional(0)), opt(provisional(1)), opt(provisional(2))))
    }

    events
      .withColumn("event_time", timestamp_micros(col("ts_micros")))
      .withWatermark("event_time", delay)
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout())(fn)
  }

  /** Streaming twin of [[graft.operators.RelationalOps.funnelStages]] for
    * the three-step funnel: [[funnelMachine]] with an unbounded horizon
    * (see there for the min-cascade ≡ ∞-horizon max-cascade argument and
    * the watermark/tie/expiry contracts).
    */
  def funnelStream(
      events: Dataset[FunnelEvent],
      steps: (String, String, String) = ("view", "click", "purchase"),
      idleExpiry: Option[java.time.Duration] = None,
      delay: String = "10 minutes"): Dataset[FunnelUpdate] =
    funnelMachine(events, Vector(steps._1, steps._2, steps._3),
      Long.MaxValue, idleExpiry, delay)

  /** Streaming twin of
    * [[graft.operators.RelationalOps.funnelStagesWindowed]] (q97):
    * conversion-window semantics — step i qualifies iff strictly after
    * AND within `window` of the MOST RECENT qualifying step-(i−1) event.
    * [[funnelMachine]] with the window as the horizon; qualifying
    * timestamps are nondecreasing under the ts-order fold, so "most
    * recent" is simply the last fold update — exactly the batch's
    * running conditional maximum.
    */
  def funnelStreamWindowed(
      events: Dataset[FunnelEvent],
      window: java.time.Duration,
      steps: (String, String, String) = ("view", "click", "purchase"),
      idleExpiry: Option[java.time.Duration] = None,
      delay: String = "10 minutes"): Dataset[FunnelUpdate] =
    // same micros + saturation rule as the batch operator
    funnelMachine(events, Vector(steps._1, steps._2, steps._3),
      graft.operators.RelationalOps.durationUsSaturating(window), idleExpiry,
      delay)

  // ---- streaming cohort activity ----------------------------------------

  case class CohortEvent(user_id: Long, ts_micros: Long)

  /** `firstTs` is committed only from behind-the-watermark events (-1 =
    * none yet); `seenOffsets` are the offsets already emitted; `buffer`
    * holds the out-of-order tail (bounded by the watermark horizon).
    */
  case class CohortState(
      firstTs: Long, seenOffsets: Seq[Long], buffer: List[Long])

  case class CohortActivity(
      user_id: Long, cohort_start: Long, period_offset: Long)

  /** Streaming twin of [[graft.operators.RelationalOps.cohortRetention]]'s
    * per-user stage: emits each (user, cohort_start, period_offset)
    * EXACTLY ONCE, so `groupBy(cohort_start, period_offset).count()` over
    * this stream's output is the batch retention matrix (parity-spec'd).
    * The cohort is the period of the user's EARLIEST event — which a late
    * arrival can change retroactively — so, like the funnel stream, rows
    * buffer until the watermark passes them and are folded in timestamp
    * order; emission happens on commit only, which is what makes the
    * exactly-once-per-offset contract (and Append mode) possible. The
    * trade-off is emission latency of one watermark horizon.
    *
    * `idleExpiry` bounds state for long-dead users (otherwise every user
    * ever seen holds a CohortState forever — cardinality-unbounded, the
    * funnelMachine hazard). The caveat is SHARPER here than the funnel's:
    * expiry forgets `seenOffsets` AND the cohort anchor, so a user
    * returning after expiry re-anchors as a NEW cohort and may re-emit —
    * the exactly-once contract then holds only per state lifetime. Leave
    * it None where retention windows are long-lived and bound state by
    * sizing the cluster instead.
    */
  def cohortActivityStream(
      events: Dataset[CohortEvent],
      periodSeconds: Long,
      idleExpiry: Option[java.time.Duration] = None,
      delay: String = "10 minutes"): Dataset[CohortActivity] = {
    import events.sparkSession.implicits._
    val periodUs = periodSeconds * 1000000L

    def fn(
        userId: Long,
        rows: Iterator[CohortEvent],
        state: GroupState[CohortState]): Iterator[CohortActivity] = {
      val prev = state.getOption.getOrElse(CohortState(-1L, Nil, Nil))
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      // idle expiry fired with nothing pending: free the dead user's state
      if (state.hasTimedOut && prev.buffer.isEmpty && rows.isEmpty &&
          idleExpiry.isDefined) {
        state.remove()
        return Iterator.empty
      }
      val merged = (prev.buffer ++ rows.map(_.ts_micros).filter(_ >= wmUs))
        .sorted
      val (commit, keep) = merged.partition(_ < wmUs)
      // all rows late-dropped and no state yet: no emission, no state
      if (!state.exists && commit.isEmpty && keep.isEmpty)
        return Iterator.empty
      var firstTs = prev.firstTs
      val seen = scala.collection.mutable.Set(prev.seenOffsets: _*)
      val out = Seq.newBuilder[CohortActivity]
      commit.foreach { ts =>
        if (firstTs < 0) firstTs = ts
        val cohortP = Math.floorDiv(firstTs, periodUs)
        val off = Math.floorDiv(ts, periodUs) - cohortP
        if (seen.add(off))
          out += CohortActivity(userId, cohortP * periodSeconds, off)
      }
      state.update(CohortState(firstTs, seen.toSeq, keep))
      // a group only re-enters fn on new data OR a timeout — without one,
      // a quiet user's buffered rows would never commit. Fire when the
      // watermark passes the oldest buffered event (clamped above the
      // current watermark, the sessionize rule); with nothing buffered,
      // arm the optional idle expiry so long-dead users' state is freed.
      if (keep.nonEmpty)
        state.setTimeoutTimestamp(math.max(
          keep.head / 1000L + 1L, state.getCurrentWatermarkMs() + 1L))
      else idleExpiry.foreach(d => state.setTimeoutTimestamp(
        state.getCurrentWatermarkMs() + math.max(d.toMillis, 1L)))
      out.result().iterator
    }

    events
      .withColumn("event_time", timestamp_micros(col("ts_micros")))
      .withWatermark("event_time", delay)
      .as[CohortEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)
  }

  /** Retention-RATE matrix (q98's streaming twin) over the exactly-once
    * activity log emitted by [[cohortActivityStream]]: because that stream
    * emits each (user, cohort, offset) exactly once, a plain `count(*)`
    * per cell IS the distinct-user count, and the rate normalization is
    * the same shared [[graft.operators.RelationalOps.retentionRateFrom]]
    * step the batch q98 uses. Run it over the activity sink table (or in
    * `foreachBatch` on an upserted snapshot) — the stateful streaming
    * work is all in the activity stream; this finishing step is
    * stateless.
    */
  def retentionRateOf(activity: DataFrame): DataFrame =
    graft.operators.RelationalOps.retentionRateFrom(
      activity.groupBy("cohort_start", "period_offset")
        .agg(count(lit(1)).as("n_active")))

  // ---- streaming gap-fill (per-key period heartbeat) --------------------

  case class GapEvent(key: Long, ts_micros: Long, value: Double)

  /** `nextEmit` = first not-yet-emitted period (-1 before the key's first
    * commit); `agg` holds per-period (cnt, sum) for committed events whose
    * period has not closed; `silent` counts consecutive zero periods
    * emitted; `lastSum` is the most recent emitted non-silent value_sum
    * (the forward-fill carry); `buffer` is the out-of-order tail above the
    * watermark.
    */
  case class GapState(
      nextEmit: Long, agg: Map[Long, (Long, Double)], silent: Int,
      lastSum: Option[Double], buffer: List[(Long, Double)])

  case class GapFillRow(
      key: Long, win_start: Long, cnt: Long, value_sum: Option[Double],
      filled_sum: Option[Double])

  /** Streaming twin of [[graft.operators.RelationalOps.gapFillPeriods]]:
    * per key, one row per CLOSED epoch-aligned period from its first event
    * onward — aggregated where data existed, an explicit zero row where
    * the key was silent. A period closes when the watermark passes its
    * end; event-time timeouts re-arm at each next boundary so silent keys
    * keep emitting zeros WITHOUT new data — that is the operator's point
    * (gap detection / heartbeat). `filled_sum` carries the batch op's
    * forward-fill (last observed value_sum) across silent periods, so a
    * consumer migrating from [[graft.operators.RelationalOps
    * .gapFillPeriods]] keeps the ffill column. Two documented differences
    * from the batch op: the still-open tail period never emits (no "last
    * event" exists on a stream), and after `maxSilentPeriods` consecutive
    * zeros the key's state drops and the heartbeat stops (bounds state
    * for dead keys; a returning event re-anchors the key as FRESH — its
    * silent gap beyond the expiry is not back-filled and the ffill carry
    * resets with it).
    */
  def gapFillStream(
      events: Dataset[GapEvent],
      periodSeconds: Long,
      maxSilentPeriods: Int = 8,
      delay: String = "10 minutes"): Dataset[GapFillRow] = {
    import events.sparkSession.implicits._
    val periodUs = periodSeconds * 1000000L

    def fn(
        key: Long,
        rows: Iterator[GapEvent],
        state: GroupState[GapState]): Iterator[GapFillRow] = {
      val prev = state.getOption.getOrElse(
        GapState(-1L, Map.empty, 0, None, Nil))
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val merged = (prev.buffer ++
        rows.map(e => (e.ts_micros, e.value)).filter(_._1 >= wmUs))
        .sortBy(_._1)
      val (commit, keep) = merged.partition(_._1 < wmUs)
      // no state yet and nothing usable (a key whose only rows were
      // late-dropped): emit nothing and — critically — create no state.
      // Without this (the funnelMachine/cohortActivityStream guard) the
      // else-branch below would write an empty GapState and arm a wm+1
      // timeout that re-fires and re-arms on every watermark advance — a
      // permanent zombie entry per late-only key.
      if (!state.exists && commit.isEmpty && keep.isEmpty)
        return Iterator.empty
      var nextEmit = prev.nextEmit
      val agg = scala.collection.mutable.Map(prev.agg.toSeq: _*)
      commit.foreach { case (ts, v) =>
        val p = Math.floorDiv(ts, periodUs)
        if (nextEmit < 0) nextEmit = p // the key's span starts here
        val (c, s) = agg.getOrElse(p, (0L, 0.0))
        agg(p) = (c + 1L, s + v)
      }
      val out = Seq.newBuilder[GapFillRow]
      var silent = prev.silent
      var lastSum = prev.lastSum
      var expired = false
      if (nextEmit >= 0) {
        val closedUpTo = Math.floorDiv(wmUs, periodUs) // exclusive bound
        while (nextEmit < closedUpTo && !expired) {
          agg.remove(nextEmit) match {
            case Some((c, s)) =>
              silent = 0
              // HALF_UP like Spark's round(sum, 2) in the batch op —
              // math.rint would be HALF_EVEN and drift on exact halves
              val rounded = BigDecimal(s)
                .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
              lastSum = Some(rounded)
              out += GapFillRow(key, nextEmit * periodSeconds, c,
                Some(rounded), lastSum)
            case None =>
              silent += 1
              if (silent > maxSilentPeriods) expired = true
              // silent period: explicit zero row, ffill carries the last
              // observed sum — the batch last(value_sum, ignoreNulls)
              else out += GapFillRow(key, nextEmit * periodSeconds, 0L,
                None, lastSum)
          }
          nextEmit += 1
        }
      }
      if (expired && keep.isEmpty && agg.isEmpty) {
        state.remove() // dead key: heartbeat stops, state dropped
      } else {
        // on expiry with data still pending (committed open-period rows or
        // buffered future events), the span RE-ANCHORS: emission resumes at
        // the earliest pending period, the expired gap is not back-filled
        val anchor =
          if (!expired) nextEmit
          else if (agg.nonEmpty) agg.keys.min
          else -1L
        state.update(GapState(anchor, agg.toMap,
          if (expired) 0 else silent,
          if (expired) None else lastSum, // fresh re-anchor resets the ffill
          keep))
        // re-arm at the next period boundary (or just past the watermark,
        // whichever is later) so zero rows flow without new data
        val nextBoundaryMs =
          if (anchor >= 0) (anchor + 1L) * periodUs / 1000L
          else Long.MinValue
        state.setTimeoutTimestamp(math.max(
          nextBoundaryMs, state.getCurrentWatermarkMs() + 1L))
      }
      out.result().iterator
    }

    events
      .withColumn("event_time", timestamp_micros(col("ts_micros")))
      .withWatermark("event_time", delay)
      .as[GapEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)
  }
}
