package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, Kernels}
import graft.operators.Bpe

/** BPE subword tokenizer: the distributed trainer against an independent
  * driver-side reference implementation, and the codegen'd token counter
  * against reference tokenization — on planted corpora AND the real
  * documents table at sf0.001.
  */
class BpeSpec extends SparkSuite {

  /** Textbook BPE, written independently of the operator under test: word
    * frequencies in a Map, pair counts in a loop, greedy left-to-right
    * merge application, ties broken lexicographically.
    */
  private def referenceTrain(
      texts: Seq[String], numMerges: Int, minFreq: Long): Seq[(String, String)] = {
    var vocab: Map[Vector[String], Long] = texts
      .flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        w.map(_.toString).toVector -> ws.size.toLong
      }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      val best = counts.toSeq.sortBy { case ((l, r), n) => (-n, l, r) }.headOption
      best match {
        case Some(((l, r), n)) if n >= minFreq =>
          merges += ((l, r))
          vocab = vocab.map { case (syms, f) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                out += l + r; i += 2
              } else { out += syms(i); i += 1 }
            }
            out.result() -> f
          }.groupMapReduce(_._1)(_._2)(_ + _)
        case _ => done = true
      }
    }
    merges.toSeq
  }

  private def referenceCount(text: String, merges: Seq[(String, String)]): Long = {
    val m = merges.map(p => Array(p._1, p._2)).toArray
    text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      .map(w => Kernels.bpeApply(w, m).length.toLong).sum
  }

  test("distributed trainer matches the reference implementation on a planted corpus") {
    import spark.implicits._
    val texts = Seq(
      "low lower lowest low low",
      "new newer newest new newer",
      "wide wider widest wide wide wider")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val trained = Bpe.train(docs, numMerges = 12, minFreq = 2)
    assert(trained === referenceTrain(texts, numMerges = 12, minFreq = 2))
    assert(trained.nonEmpty && trained.length <= 12)
    // merged symbols compose across ranks (a later merge consumes an
    // earlier merge's output) — the cascade a trivial pair list never hits
    assert(trained.exists { case (l, r) => l.length > 1 || r.length > 1 })
  }

  test("trainer matches the reference on the real sf0.001 documents corpus") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val trained = Bpe.train(docs, numMerges = 8, minFreq = 2)
    val texts = docs.select("text").collect().map(_.getString(0)).toSeq
    assert(trained === referenceTrain(texts, numMerges = 8, minFreq = 2))
  }

  test("token counter applies ranks in order with left-to-right non-overlap") {
    // 'aaa' under (a,a): one pass merges the FIRST pair only → [aa, a]
    assert(Kernels.bpeApply("aaa", Array(Array("a", "a"))).toSeq === Seq("aa", "a"))
    // cascade: (a,b) then (t,ab) — "tab" → [t, ab] → [tab]
    val casc = Array(Array("a", "b"), Array("t", "ab"))
    assert(Kernels.bpeApply("tab", casc).toSeq === Seq("tab"))
    // rank order matters: reversed ranks never form "ab" before (t,ab) runs
    assert(Kernels.bpeApply("tab", casc.reverse).toSeq === Seq("t", "ab"))
  }

  test("merge tables round-trip through versioned storage") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val trained = Bpe.train(docs, numMerges = 6, minFreq = 2)
    val root = java.nio.file.Files.createTempDirectory("graft-bpem")
      .toFile.getAbsolutePath
    Bpe.saveMerges(spark, trained, root)
    assert(Bpe.loadMerges(spark, root) === trained)
    // counts under the loaded table are identical to the trained one
    val a = Bpe.tokenCounts(docs, trained).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Bpe.tokenCounts(docs, Bpe.loadMerges(spark, root)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("codegen'd counts equal reference counts; trained merges shrink them") {
    import spark.implicits._
    val texts = Seq(
      "the scan table scrolls", "roab tababab scale", "", "  le ro sc ab  ")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Bpe.tokenCounts(docs).orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = texts.zipWithIndex
      .map { case (t, i) => i.toLong -> referenceCount(t, Bpe.referenceMerges) }.toMap
    assert(got === want)
    // on the real corpus: trained merges strictly shrink the char count
    val corpus = Tables(spark, "/root/testdata/sf0.001", "documents")
    val trained = Bpe.train(corpus, numMerges = 8, minFreq = 2)
    val counts = corpus.select(
        sum(GraftFunctions.bpe_count(col("text"), trained)).as("bpe"),
        sum(GraftFunctions.bpe_count(col("text"), Nil)).as("chars"))
      .collect().head
    assert(counts.getLong(0) < counts.getLong(1))
  }
}
