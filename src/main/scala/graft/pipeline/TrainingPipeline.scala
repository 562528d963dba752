package graft.pipeline

import graft.functions.TextOps
import graft.operators.DedupClustering
import graft.queries.{TextQueries, VectorQueries}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** One-call training-data pipeline — the LLM-ops analogue of
  * [[graft.etl.Pipeline.runEtl]]: where runEtl orchestrates the reference's
  * extract → clean → aggregate → report, this orchestrates the extension
  * surface end to end: score → (optional) dedup → quality filter →
  * (optional) embedding-code join → partitioned artifact + composition
  * stats. Every stage reuses THE shared definition the registry queries are
  * built from (TextOps expressions, the MinHash/LSH/CC chain, the int8 code
  * family), so a pipeline run and the oracled q17–q62 queries can never
  * disagree about semantics.
  */
object TrainingPipeline {

  sealed trait DedupMode
  /** Keep every document (still quality-filtered). */
  case object NoDedup extends DedupMode
  /** q20 semantics: one canonical doc (min doc_id) per exact normalized-
    * content fingerprint. One groupBy + one broadcast-able join.
    */
  case object ExactDedup extends DedupMode
  /** q43/q58/q61 semantics: connected components over MinHash+LSH candidate
    * pairs; each near-dup cluster keeps its minimum doc_id.
    */
  case object NeardupDedup extends DedupMode

  /** @param minQuality  keep docs with qualityScore ≥ this (NULL text drops)
    * @param dedup       dedup mode (see the case objects)
    * @param maxIters    CC iteration budget (neardup mode)
    * @param checkpointDir reliable-checkpoint dir for CC (neardup mode);
    *                    None = executor-local (see DedupClustering)
    */
  case class Config(
      minQuality: Double = 0.5,
      dedup: DedupMode = NeardupDedup,
      maxIters: Int = 20,
      checkpointDir: Option[String] = None)

  /** Non-canonical doc_ids under the configured dedup mode. */
  private def losers(docs: DataFrame, cfg: Config): Option[DataFrame] =
    cfg.dedup match {
      case NoDedup => None
      case ExactDedup => Some(
        docs
          .select(col("doc_id"), TextOps.fingerprintMd5(col("text")).as("__fp"))
          .withColumn("__canonical",
            min(col("doc_id")).over(
              org.apache.spark.sql.expressions.Window.partitionBy("__fp")))
          .filter(col("doc_id") =!= col("__canonical"))
          .select("doc_id"))
      case NeardupDedup => Some(
        DedupClustering.connectedComponents(
            TextQueries.candidatePairsFrom(
              TextQueries.sigsFrom(TextQueries.shingledDocs(docs))),
            maxIters = cfg.maxIters, checkpointDir = cfg.checkpointDir)
          .filter(col("doc_id") =!= col("cluster_id"))
          .select("doc_id"))
    }

  /** The export frame: doc_id, n_tokens, quality, lang_pred
    * (+ codes_csv when `embeddings` is given — inner join on
    * doc_id = vec_id, so docs without an embedding drop, like q61).
    */
  def export(
      docs: DataFrame,
      embeddings: Option[DataFrame] = None,
      cfg: Config = Config()): DataFrame = {
    val deduped = losers(docs, cfg) match {
      case Some(l) => docs.join(l, Seq("doc_id"), "left_anti")
      case None    => docs
    }
    val kept = deduped
      .select(col("doc_id"), col("text"),
        TextOps.tokens(TextOps.normalized(col("text"))).as("toks"))
      .select(col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextOps.qualityScore(col("text")).as("quality"),
        TextOps.langIdFromTokens(col("toks"), col("text")).as("lang_pred"))
      .filter(col("quality") >= cfg.minQuality)
    embeddings match {
      case Some(emb) =>
        val codes = VectorQueries.withInt8Codes(emb)
          .select(col("vec_id").as("doc_id"),
            concat_ws(",", transform(col("codes"), _.cast("string"))).as("codes_csv"))
        kept.join(codes, Seq("doc_id"))
      case None => kept
    }
  }

  /** Composition stats of an export frame (the q62 shape): per (lang,
    * 50-token band) doc/token counts — integer aggregates only.
    */
  def stats(exported: DataFrame): DataFrame =
    exported
      .groupBy(col("lang_pred"),
        floor(col("n_tokens") / lit(50)).cast("long").as("len_band"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))

  /** Write the artifact + its stats sidecar. `partitionByLang` switches the
    * parquet layout to hive-partitioning on lang_pred — the layout a
    * per-language training consumer prunes on (mirrors runEtl's
    * partitionByWeek option).
    */
  def writeExport(
      docs: DataFrame,
      embeddings: Option[DataFrame],
      outDir: String,
      cfg: Config = Config(),
      partitionByLang: Boolean = false): DataFrame = {
    val exported = export(docs, embeddings, cfg).cache() // fans out to 2 sinks
    val writer = exported.write.mode(SaveMode.Overwrite)
    if (partitionByLang) writer.partitionBy("lang_pred").parquet(s"$outDir/export")
    else writer.parquet(s"$outDir/export")
    stats(exported).write.mode(SaveMode.Overwrite).parquet(s"$outDir/stats")
    exported
  }
}
