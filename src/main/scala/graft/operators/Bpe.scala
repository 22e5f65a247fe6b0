package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer: distributed merge training plus
  * an exact, codegen'd token counter — the tokenizer-exact budget math the
  * sampling operators (d16/d24) approximate with a regex count. The
  * reference bridge has no tokenizer; this is engine-side surface a
  * training-data pipeline needs.
  *
  * Scale shape of [[train]]: the corpus is scanned ONCE into a distinct
  * (word, freq) relation — vocabulary-bounded, orders of magnitude smaller
  * than the corpus, and the ONLY relation the merge loop ever touches.
  * Each merge iteration is one map-side-combinable pair-count aggregation
  * over that relation plus a `limit(1)` collect of the single argmax row
  * (driver traffic = one pair per iteration), then a higher-order-function
  * rewrite of the symbol arrays — no shuffle beyond the aggregation, no
  * driver-side corpus data, lineage truncated per iteration so the plan
  * stays iteration-bounded. 100 TB of text with a 10M-word vocabulary
  * trains at the cost of numMerges small aggregations after one scan.
  *
  * Merge-apply semantics (shared with [[graft.functions.Kernels.bpeApply]]
  * and pinned by spec): per rank, every adjacent (left, right) occurrence
  * rewrites in ONE left-to-right non-overlapping pass; ranks apply in
  * order. Ties on pair frequency break lexicographically so training is
  * deterministic and engine-portable.
  */
object Bpe {

  /** One whitespace word per row → (syms: Array[String], freq). */
  private def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(split(col("w"), "").as("syms"), col("freq"))

  /** The fold that applies ONE merge (l, r) to a symbol array — the exact
    * left-to-right non-overlapping pass: a merge consumes both symbols, so
    * its output (l+r ≠ l) can never re-trigger as the left operand within
    * the same rank.
    */
  private def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, s) =>
        when(
          size(acc) > 0 && element_at(acc, -1) === lit(l) && s === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(s))))

  /** Train `numMerges` BPE merges on the corpus; stops early when the best
    * remaining pair falls under `minFreq`. Returns ranks in merge order.
    *
    * The per-merge `localCheckpoint` carries the usual cluster-fault
    * caveat (an executor loss loses the truncated-lineage blocks): fine
    * here because the trainer's loop is RESTARTABLE from its inputs —
    * the vocabulary relation is one corpus scan away and merges are a
    * driver-held list — unlike a view refresh, whose staging is durable
    * ([[graft.sources.Ivm.Stages]]) because its intermediates feed a
    * published commit.
    */
  def train(
      docs: DataFrame,
      textCol: String = "text",
      numMerges: Int = 32,
      minFreq: Long = 2L): Seq[(String, String)] = {
    var words = wordTable(docs, textCol).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (!exhausted && merges.length < numMerges) {
      val top = words
        .withColumn("_l", slice(col("syms"), lit(1), size(col("syms")) - 1))
        .withColumn("_r", slice(col("syms"), lit(2), size(col("syms")) - 1))
        .select(col("freq"), explode(arrays_zip(col("_l"), col("_r"))).as("p"))
        .groupBy(col("p._l").as("l"), col("p._r").as("r"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(desc("n"), asc("l"), asc("r"))
        .limit(1)
        .collect()
      if (top.isEmpty || top(0).getAs[Long]("n") < minFreq) exhausted = true
      else {
        val l = top(0).getString(0)
        val r = top(0).getString(1)
        merges += ((l, r))
        words = words
          .withColumn("syms", applyMerge(col("syms"), l, r))
          .localCheckpoint(true)
      }
    }
    merges.toSeq
  }

  /** Fixed demonstration merges over the documents vocabulary — single
    * characters composing through a two-rank cascade ('a'+'b' then
    * 't'+'ab'), so the registered query exercises rank ordering, not just
    * independent pair rewrites. Fixed (rather than trained) so the DuckDB
    * oracle can mirror the apply exactly with sequential single-character
    * `replace()` encodings.
    */
  val referenceMerges: Seq[(String, String)] = Seq(
    ("a", "b"), ("t", "ab"), ("l", "e"), ("s", "c"), ("r", "o"))

  /** Persist a trained merge table as a Versioned table — tokenizers are
    * trained once and applied for the life of a data mix, so the merges
    * belong in versioned storage next to the corpora they tokenize (and
    * retraining is just the next version; time travel reproduces any
    * historical budget computation exactly). Returns the committed version.
    */
  def saveMerges(
      spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)],
      root: String): Long = {
    import spark.implicits._
    graft.sources.Versioned.commit(
      merges.zipWithIndex
        .map { case ((l, r), i) => (i.toLong, l, r) }
        .toDF("rank", "left", "right").coalesce(1),
      root)
  }

  /** The merge table of `root`'s latest version (or `asOf` a version via
    * [[graft.sources.Versioned.asOf]] + this ordering), in rank order.
    */
  def loadMerges(
      spark: org.apache.spark.sql.SparkSession, root: String): Seq[(String, String)] =
    graft.sources.Versioned.latest(spark, root)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq

  /** Per-document exact token counts under `merges` — one codegen'd kernel
    * call per row, no shuffle at all.
    */
  def tokenCounts(
      docs: DataFrame,
      merges: Seq[(String, String)] = referenceMerges): DataFrame =
    docs.select(
      col("doc_id"),
      graft.functions.GraftFunctions.bpe_count(col("text"), merges).as("n_tokens"))
}
