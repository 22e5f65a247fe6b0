package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the LLM-pipeline operators composed
  * the way a corpus build actually runs them — quality gate → exact dedup →
  * per-source corpus statistics. Each stage is one of the already-verified
  * operators; the composition stays a single declarative plan (Catalyst
  * fuses the quality filter into the scan side of the dedup aggregation).
  */
object Curate {

  /** @param minQuality quality-score gate (see TextAnalysis.qualityScore) */
  def corpusStats(docs: DataFrame, minQuality: Double = 0.5): DataFrame = {
    val scored = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("n_words"), col("quality"))
    val meta = docs.select(col("doc_id"), col("source"), col("text"))

    val kept = meta
      .join(scored, "doc_id")
      .filter(col("quality") >= minQuality)

    // exact dedup: survivor = min doc_id per content hash (among kept docs)
    val survivors = kept
      .groupBy(md5(to_binary(col("text"), lit("utf-8"))).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")

    kept
      .join(survivors, "doc_id")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_tokens"),
        (sum(col("quality").cast("decimal(18,12)")).cast("double") / count(lit(1)))
          .as("avg_quality"))
      .orderBy(col("source"))
  }
}
