package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curate, Dedup, Firehose, Relational, TextAnalysis}

/** Specs for the round-2 coverage operators (q4/q6/correlated/histogram,
  * m9 counter increase, t5-t7 text ops, d8 normalized dedup, d9 weighted
  * sampling).
  */
class CoverageOpsSpec extends SparkSuite {

  test("counter increase sums positive deltas and clamps resets per window") {
    import spark.implicits._
    // one series: 10 → 15 (+5), 15 → 3 (reset → +3), 3 → 7 (+4); first row +0
    val metrics = Seq(
      ("1", 100L, 10.0), ("2", 200L, 15.0), ("3", 300L, 3.0), ("4", 400L, 7.0))
      .toDF("id", "timestamp", "value")
      .withColumn("component", lit("app"))
      .withColumn("name", lit("c_total"))
      .withColumn("labels", map(lit("user"), lit("u1")))
    val out = Firehose.counterIncrease(metrics, widthSec = 3600)
      .select("win_start", "increase", "n_samples").collect()
    assert(out.length === 1)
    assert(out(0).getLong(0) === 0L)
    assert(out(0).getDouble(1) === 12.0) // 0 + 5 + 3 + 4
    assert(out(0).getLong(2) === 4L)
  }

  test("irate/delta family reads the window's endpoint samples and nulls singletons") {
    import spark.implicits._
    // window 0: 10@100 → 20@200 → 14@300: delta 4, idelta −6, and the
    // last pair is a counter reset → irate = 14/(300−200)
    // window 3600: one sample → all three null (PromQL emits nothing)
    // window 7200: two samples at the SAME timestamp → irate null (no ÷0)
    val metrics = Seq(
      ("1", 100L, 10.0), ("2", 200L, 20.0), ("3", 300L, 14.0),
      ("4", 3700L, 42.0),
      ("b1", 7300L, 5.0), ("b2", 7300L, 8.0))
      .toDF("id", "timestamp", "value")
      .withColumn("component", lit("app"))
      .withColumn("name", lit("c_total"))
      .withColumn("labels", map(lit("user"), lit("u1")))
    val out = Firehose.irateDelta(metrics).collect()
      .map(r => r.getAs[Long]("win_start") -> r).toMap
    val w0 = out(0L)
    assert(w0.getAs[Double]("delta") === 4.0)
    assert(w0.getAs[Double]("idelta") === -6.0)
    assert(w0.getAs[Double]("irate") === 0.14)
    val w1 = out(3600L)
    assert(w1.isNullAt(w1.fieldIndex("delta")))
    assert(w1.isNullAt(w1.fieldIndex("irate")))
    val w2 = out(7200L)
    assert(w2.getAs[Double]("delta") === 3.0)
    assert(w2.getAs[Double]("idelta") === 3.0)
    assert(w2.isNullAt(w2.fieldIndex("irate")))
  }

  test("over-time family: algebraic aggregates plus (ts, id)-tiebroken last") {
    import spark.implicits._
    // window 0: 1,2,3,4 → sum 10, sumsq 30, avg 2.5, stdvar (30−25)/4,
    // last 4; window 7200: two samples at the SAME ts → id breaks the tie
    val metrics = Seq(
      ("1", 100L, 1.0), ("2", 200L, 2.0), ("3", 300L, 3.0), ("4", 400L, 4.0),
      ("b1", 7300L, 5.0), ("b2", 7300L, 8.0))
      .toDF("id", "timestamp", "value")
      .withColumn("component", lit("app"))
      .withColumn("name", lit("g"))
      .withColumn("labels", map(lit("user"), lit("u1")))
    val out = Firehose.overTimeAgg(metrics).collect()
      .map(r => r.getAs[Long]("win_start") -> r).toMap
    val w0 = out(0L)
    assert(w0.getAs[Long]("n_samples") === 4L)
    assert(w0.getAs[Double]("sum_value") === 10.0)
    assert(w0.getAs[Double]("sumsq_value") === 30.0)
    assert(w0.getAs[Double]("avg_value") === 2.5)
    assert(w0.getAs[Double]("stdvar_value") === 1.25)
    assert(w0.getAs[Double]("stddev_value") === math.sqrt(1.25))
    assert(w0.getAs[Double]("last_value") === 4.0)
    assert(out(7200L).getAs[Double]("last_value") === 8.0)
  }

  test("holt winters replays the PromQL smoothing recursion per window") {
    import spark.implicits._
    // window 0: v = [10, 20, 14] → s₁ = v₁ = 20, b₁ = 10,
    // s₂ = 0.5·14 + 0.5·(20+10) = 22; window 3600: singleton → null;
    // window 7200: two samples → smoothed = second value exactly
    val metrics = Seq(
      ("1", 100L, 10.0), ("2", 200L, 20.0), ("3", 300L, 14.0),
      ("4", 3700L, 42.0),
      ("5", 7300L, 6.0), ("6", 7400L, 9.0))
      .toDF("id", "timestamp", "value")
      .withColumn("component", lit("app"))
      .withColumn("name", lit("c_total"))
      .withColumn("labels", map(lit("user"), lit("u1")))
    val out = Firehose.holtWinters(metrics).collect()
      .map(r => r.getAs[Long]("win_start") -> r).toMap
    assert(out(0L).getAs[Double]("smoothed") === 22.0)
    assert(out(3600L).isNullAt(out(3600L).fieldIndex("smoothed")))
    assert(out(7200L).getAs[Double]("smoothed") === 9.0)
  }

  test("quality funnel counts each rule's rejections, nulls failing as false") {
    import spark.implicits._
    // doc 2 passes every rule (50 words, mean len 3.96, two distinct
    // stopwords); doc 1 is empty, so every signal is null/zero and must
    // count as a failure on all five rules
    val passText = (Seq.fill(48)("word") ++ Seq("the", "and")).mkString(" ")
    val docs = Seq((1L, "", "s"), (2L, passText, "s")).toDF("doc_id", "text", "source")
    val out = TextAnalysis.qualityFunnel(docs).collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getAs[Long]("n_docs") === 2L)
    assert(r.getAs[Long]("n_pass") === 1L)
    for (c <- Seq("n_fail_words", "n_fail_wordlen", "n_fail_symbol",
        "n_fail_alpha", "n_fail_stop"))
      assert(r.getAs[Long](c) === 1L, c)
    assert(r.getAs[Double]("pass_rate") === 0.5)
  }

  test("scd2 apply closes changed and vanished keys and opens new versions") {
    import spark.implicits._
    val hist = Seq(
      (1L, "a", 10.0, 0L, Option.empty[Long], 1L), // unchanged → stays open
      (2L, "b", 20.0, 0L, Option.empty[Long], 1L), // changed → close + open
      (3L, "c", 30.0, 0L, Option.empty[Long], 1L), // vanished → close
      (9L, "OLD z", 90.0, -100L, Option(0L), 0L), // closed history: passthrough
      (9L, "z", 91.0, 0L, Option.empty[Long], 1L)) // unchanged current
      .toDF("c_custkey", "c_name", "c_acctbal", "valid_from", "valid_to", "is_current")
    val snap = Seq(
      (1L, "a", 10.0), (2L, "b2", 20.0), (4L, "d", 40.0), (9L, "z", 91.0))
      .toDF("c_custkey", "c_name", "c_acctbal")
    val out = Curate.scd2Apply(hist, snap, "c_custkey", ts = 100L)
      .as[(Long, String, Double, Long, Option[Long], Long)].collect().toSet
    assert(out === Set(
      (1L, "a", 10.0, 0L, None, 1L),
      (2L, "b", 20.0, 0L, Some(100L), 0L),
      (2L, "b2", 20.0, 100L, None, 1L),
      (3L, "c", 30.0, 0L, Some(100L), 0L),
      (4L, "d", 40.0, 100L, None, 1L),
      (9L, "OLD z", 90.0, -100L, Some(0L), 0L),
      (9L, "z", 91.0, 0L, None, 1L)))
  }

  test("label_replace leaves series with an unmatched source label untouched") {
    import spark.implicits._
    // u1 starts non-digit → regex ^(\d) unmatched → no tier label, and
    // label_join's instance sees only the user value; 42 matches → both
    val metrics = Seq(("1", 100L, 1.0, "u1"), ("2", 200L, 2.0, "42"))
      .toDF("id", "timestamp", "value", "u")
      .withColumn("component", lit("app"))
      .withColumn("name", lit("g"))
      .withColumn("labels", map(lit("user"), col("u")))
    val out = Firehose.labelOps(metrics).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("1") === "instance=u1,user=u1")
    assert(out("2") === "instance=42-4,tier=4,user=42")
  }

  test("k-anonymity masks the quasi-identifiers of classes below k") {
    import spark.implicits._
    val df = Seq(
      (1L, "en", "web"), (2L, "en", "web"), (3L, "en", "web"),
      (4L, "fr", "web"))
      .toDF("doc_id", "lang", "source")
    val out = Curate.kAnonymitySuppress(df, Seq("lang", "source"), k = 2)
      .as[(Long, String, String, Long, Long)].collect().toSet
    assert(out === Set(
      (1L, "en", "web", 3L, 0L),
      (2L, "en", "web", 3L, 0L),
      (3L, "en", "web", 3L, 0L),
      (4L, "*", "*", 1L, 1L)))
  }

  test("dp release perturbs counts by seeded Laplace noise, deterministically") {
    import spark.implicits._
    val df = ((1 to 40).map(i => ("view", i * 2.0)) ++
      (1 to 10).map(i => ("purchase", 500.0)))
      .toDF("event_type", "value")
    val out = Curate.dpRelease(df, seed = "graft-dp").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // deterministic: the same seed reproduces the release exactly
    val again = Curate.dpRelease(df, seed = "graft-dp").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out === again)
    // a different seed is a different draw
    val other = Curate.dpRelease(df, seed = "other").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(other("view")._1 !== out("view")._1)
    // noise is real but Laplace(4)-scaled: counts land near the truth
    // (|noise| < 4·ln(2^20)·“tail” ⇒ bound by the grid's worst case 55.5)
    assert(math.abs(out("view")._1 - 40.0) > 0.0)
    assert(math.abs(out("view")._1 - 40.0) < 56.0)
    assert(math.abs(out("purchase")._1 - 10.0) < 56.0)
    // sums are contribution-bounded before noising: purchase's true
    // clamped sum is 10·100 = 1000, and Laplace(400) noise stays within
    // the grid's worst case 400·13.9
    assert(math.abs(out("purchase")._2 - 1000.0) < 400.0 * 13.9)
  }

  test("absent alert flags the first missing window of each gap, not the trailing edge") {
    import spark.implicits._
    // u1 reports in windows 0, 60, 240 (gap: 120 missing, 180 missing —
    // only 120 flags) and nothing after 240; u2 reports in every window
    // through 300 (sets the high-water mark, so u1's trailing 300 is
    // "stream hasn't caught up", not a gap... it IS a gap: u1@240 +60=300
    // <= max 300 and u1 has no 300 → flags). u2 never flags.
    val metrics = (Seq((0L, "u1"), (70L, "u1"), (250L, "u1")) ++
      (0 to 5).map(i => (i * 60L + 5L, "u2")))
      .zipWithIndex.map { case ((ts, u), i) => (i.toString, ts, u) }
      .toDF("id", "timestamp", "user")
      .withColumn("component", lit("app"))
      .withColumn("name", lit("c_total"))
      .withColumn("value", lit(1.0))
      .withColumn("labels", map(lit("user"), col("user")))
    val out = Firehose.absentAlert(metrics, widthSec = 60)
      .collect().map(r => r.getAs[String]("series") -> r.getAs[Long]("absent_win"))
    // u1: windows 0, 60, 240 present → gaps flag at 120 (after 60) and 300
    // (after 240; within the u2-set high-water mark of 300)
    assert(out.toSet === Set("user=u1" -> 120L, "user=u1" -> 300L), s"got ${out.toSeq}")
  }

  test("gap fill inserts forward-filled slots between samples") {
    import spark.implicits._
    // samples at slots 0 and 7200 with 3600 step: slot 3600 is synthesized
    // and carries the slot-0 value
    val metrics = Seq(("1", 100L, 5.0), ("2", 7500L, 9.0))
      .toDF("id", "timestamp", "value")
      .withColumn("component", lit("app"))
      .withColumn("name", lit("g"))
      .withColumn("labels", map(lit("user"), lit("u1")))
    val out = Firehose.gapFill(metrics, stepSec = 3600)
      .select("slot", "value", "filled").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(out === Map(
      0L -> ((5.0, false)),
      3600L -> ((5.0, true)),  // synthesized, forward-filled
      7200L -> ((9.0, false))))
  }

  test("pii redaction counts and masks emails, phones and ips") {
    import spark.implicits._
    val docs = Seq(
      (1L, "reach me at bob.smith+x@example.org or 555-123-4567"),
      (2L, "server 10.0.42.7 responded"),
      (3L, "nothing sensitive here"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.piiRedact(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) === 1L) // email
    assert(out(1L).getLong(2) === 1L) // phone
    assert(out(1L).getString(4) === "reach me at <EMAIL> or <PHONE>")
    assert(out(2L).getLong(3) === 1L) // ip
    assert(out(2L).getString(4) === "server <IP> responded")
    assert(out(3L).getString(4) === "nothing sensitive here")
  }

  test("normalized dedup collapses case and whitespace variants") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello   World"), (2L, "hello world"), (3L, "  HELLO WORLD "),
      (4L, "different"))
      .toDF("doc_id", "text")
    val out = Dedup.exactNormalized(docs)
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 3L, 4L -> 1L))
  }

  test("weighted sampling is deterministic and keeps k per group") {
    val docs = Tables(spark, sfDir, "documents")
    val s1 = Curate.weightedSamplePerGroup(docs, "source", k = 3)
    val s2 = Curate.weightedSamplePerGroup(docs.repartition(7), "source", k = 3)
    val rows1 = s1.collect().map(_.toString).sorted.toSeq
    val rows2 = s2.collect().map(_.toString).sorted.toSeq
    assert(rows1 === rows2) // partitioning-independent
    val perGroup = s1.groupBy("source").count().collect()
    assert(perGroup.forall(_.getLong(1) <= 3))
  }

  test("weighted sampling follows Efraimidis-Spirakis inclusion probabilities") {
    import spark.implicits._
    // 1000 independent two-doc groups, weights 3 vs 1: E-S says the heavy
    // doc wins P = 3/4 of groups. The draw is a fixed function of the hash,
    // so the observed rate is deterministic — the assertion window (±5%,
    // ~3.6 binomial sd) guards the math, not flakiness.
    val docs = (0 until 1000).flatMap { g =>
      Seq((2L * g, "w w w", s"g$g"), (2L * g + 1, "l", s"g$g"))
    }.toDF("doc_id", "text", "source")
    val winners = Curate.weightedSamplePerGroup(docs, "source", k = 1)
    val heavyWins = winners.filter(col("doc_id") % 2 === 0).count()
    assert(heavyWins > 700 && heavyWins < 800, s"heavy won $heavyWins/1000")
  }

  test("top bigrams are counted with multiplicity and ranked deterministically") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    // bigrams: doc1 = {a b, b a, a b}, doc2 = {a b, b c}
    val out = TextAnalysis.topBigrams(docs, k = 2)
      .as[(String, Long)].collect().toSeq
    assert(out === Seq(("a b", 3L), ("b a", 1L))) // tie 1-1 broken by bigram asc
  }

  test("vocab stats count corpus-level distinct words per source") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y z", "s1"), (2L, "x x q", "s1"), (3L, "w", "s2"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.vocabStats(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("s1").getLong(1) === 2L)   // n_docs
    assert(out("s1").getLong(2) === 6L)   // n_tokens
    assert(out("s1").getLong(4) === 4L)   // vocab {x,y,z,q}
    assert(out("s2").getLong(4) === 1L)
  }

  test("NOT IN subquery plans as a null-aware anti join") {
    val df = Relational.qNotInNullAware(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected an anti join in:\n$plan")
    // customers whose key appears in the pricey-order set must be absent
    val pricey = Tables(spark, sfDir, "orders")
      .filter(col("o_totalprice") > 300000).select("o_custkey")
    assert(df.join(pricey, col("c_custkey") === col("o_custkey"), "left_semi").count() === 0)
  }

  test("full outer join keeps both unmatched sides") {
    val out = Relational.qFullOuter(spark, sfDir)
    // non-BUILDING customers' order activity survives as left-null rows at
    // any scale; right-nulls (orderless BUILDING customers) depend on the
    // data, so that direction is covered by the inline frame below
    assert(out.filter(col("c_name").isNull).count() > 0, "no left-null rows")
    import spark.implicits._
    val l = Seq((1L, "a"), (2L, "b")).toDF("k", "lv")
    val r = Seq((2L, "x"), (3L, "y")).toDF("k2", "rv")
    val f = l.join(r, col("k") === col("k2"), "full_outer").collect()
    assert(f.length === 3)
    assert(f.count(row => row.isNullAt(0)) === 1) // unmatched right
    assert(f.count(row => row.isNullAt(2)) === 1) // unmatched left
  }

  test("range-frame rolling sum only covers the trailing hour") {
    val out = Relational.qWindowRange(spark, sfDir)
    // every count is at least 1 (current row in frame) and the rolling sum
    // of a singleton window equals the row value
    assert(out.filter(col("n_in_window") < 1).count() === 0)
  }

  test("hll sketch estimate tracks exact distinct counts") {
    val o = Tables(spark, sfDir, "orders")
    val exact = o.select(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    // Spark 4 DataSketches HLL: buildable, mergeable, estimable
    val est = o.selectExpr("hll_sketch_estimate(hll_sketch_agg(o_custkey)) AS e")
      .collect()(0).getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"estimate $est too far from exact $exact")
  }

  test("incremental dedup admits only hashes unseen in the corpus") {
    import spark.implicits._
    val existing = Seq((0L, "aa"), (2L, "bb")).toDF("doc_id", "text")
    val delta = Seq((1L, "aa"), (3L, "cc"), (5L, "cc"), (7L, "dd"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(existing, delta)
      .select("doc_id", "n_in_delta").as[(Long, Long)].collect().toSet
    // "aa" already landed; "cc" enters once (doc 3, 2 copies); "dd" enters
    assert(out === Set((3L, 2L), (7L, 1L)))
  }

  test("embedding centroids average element-wise per label") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(1.0f, 3.0f), 0), (2L, Array(3.0f, 5.0f), 0),
      (3L, Array(10.0f, 20.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = graft.operators.Similarity.labelCentroids(emb)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    assert(out((0, 0)) === 2.0 && out((0, 1)) === 4.0)
    assert(out((1, 0)) === 10.0 && out((1, 1)) === 20.0)
  }

  test("unpivot restores the long form of the pivoted table") {
    val wide = Relational.qPivot(spark, sfDir)
    val long = Relational.qUnpivot(spark, sfDir)
    val nonNullCells = wide.selectExpr(
      "o_orderpriority",
      "(CASE WHEN sum_f IS NULL THEN 0 ELSE 1 END + CASE WHEN sum_o IS NULL THEN 0 ELSE 1 END + CASE WHEN sum_p IS NULL THEN 0 ELSE 1 END) AS n")
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(long.count() === nonNullCells)
  }

  test("histogram quantile interpolates within the located bucket") {
    import spark.implicits._
    // 10 samples 1..10 in metric m, buckets (5, 10): p90 rank=9 lands in
    // (5,10] with cum_prev=5, cum=10 → 5 + 5*(9-5)/(10-5) = 9.0
    val metrics = (1 to 10).map(v => ("m", v.toDouble)).toDF("name", "value")
    val out = Firehose.histogramQuantile(metrics, les = Seq(5.0, 10.0), q = 0.9)
      .select("name", "quantile").collect()
    assert(out.length === 1)
    assert(out(0).getDouble(1) === 9.0)
  }

  test("lm score ranks formulaic docs above out-of-domain ones") {
    import spark.implicits._
    // "the" splits 2:1 between cat and dog — the majority continuation
    // scores higher: docs 1/2 avg (2/3 + 1)/2, doc 3 avg (1/3 + 1)/2
    val docs = Seq(
      (1L, "the cat sat"), (2L, "the cat sat"), (3L, "the dog ran"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) > out(3L))
    assert(out(1L) === out(2L)) // identical docs score identically
  }

  test("chunk windows split documents into overlapping token sequences") {
    import spark.implicits._
    // 7 tokens, chunk=4, overlap=2 → step 2, chunks: [1..4], [3..6], [5..7]
    val docs = Seq((1L, "a b c d e f g"), (2L, "x"), (3L, "  "))
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkWindows(docs, chunkTokens = 4, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out === Map(
      (1L, 0L) -> ((4L, "a b c d")),
      (1L, 1L) -> ((4L, "c d e f")),
      (1L, 2L) -> ((3L, "e f g")),
      (2L, 0L) -> ((1L, "x")))) // empty doc 3 yields no chunks
  }

  test("mixture sampling fills per-source quotas deterministically") {
    val docs = Tables(spark, sfDir, "documents")
    val weights = Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25)
    val s1 = Curate.mixtureSample(docs, weights, kTotal = 20)
    val s2 = Curate.mixtureSample(docs.repartition(7), weights, kTotal = 20)
    assert(s1.collect().map(_.toString).sorted.toSeq ===
      s2.collect().map(_.toString).sorted.toSeq) // partitioning-independent
    val bySource = s1.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource === Map("src0" -> 10L, "src1" -> 5L, "src2" -> 5L))
  }

  test("incremental minhash finds cross-side near-dups only") {
    import spark.implicits._
    val mk = (s: String) => s // readable alias
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val corpus = Seq(
      (0L, base),
      (2L, "completely different corpus content with no shared shingles at all here"))
      .toDF("doc_id", "text")
    val delta = Seq(
      (1L, base + " ok"), // near-dup of corpus doc 0
      (3L, base + " ok"), // near-dup of 0 AND of delta doc 1 — but delta×delta must not pair
      (5L, "unrelated delta text that matches nothing in the landed corpus rows"))
      .toDF("doc_id", "text")
    val out = Dedup.minhashLshIncremental(corpus, delta, threshold = 0.5)
      .select("corpus_id", "delta_id").as[(Long, Long)].collect().toSet
    assert(out === Set((0L, 1L), (0L, 3L)))
  }

  test("sequence packing walks chunks in order and opens a pack on overflow") {
    import spark.implicits._
    // budget 10: chunks 6,3 fit pack 0 (fill 9); 4 overflows → pack 1 with
    // 4,5 (fill 9); an oversized chunk (12) always gets its own pack
    val chunks = Seq(
      ("s1", 1L, 0L, 6L), ("s1", 1L, 1L, 3L), ("s1", 2L, 0L, 4L),
      ("s1", 2L, 1L, 5L), ("s1", 3L, 0L, 12L),
      ("s2", 1L, 0L, 2L))
      .toDF("source", "doc_id", "chunk_id", "n_chunk_tokens")
    val out = Curate.packSequences(chunks, budget = 10)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out === Map(
      ("s1", 0L) -> ((2L, 9L)),
      ("s1", 1L) -> ((2L, 9L)),
      ("s1", 2L) -> ((1L, 12L)),
      ("s2", 0L) -> ((1L, 2L))))
    // invariants: no pack over budget except single oversized chunks; total
    // tokens preserved
    assert(out.values.map(_._2).sum === 6 + 3 + 4 + 5 + 12 + 2)
    assert(out.values.forall { case (n, tok) => tok <= 10 || n == 1 })
  }

  test("decontamination flags corpus docs covering benchmark shingles") {
    import spark.implicits._
    // benchmark doc 0: 7 tokens → 5 distinct 3-gram shingles; corpus doc 1
    // embeds it verbatim (all 5 shared → containment 1.0); doc 2 unrelated
    val bench = Seq((0L, "alpha beta gamma delta epsilon zeta eta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta and more trailing words"),
      (2L, "totally unrelated corpus document with nothing shared at all"))
      .toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, bench, minCommon = 5)
      .select("doc_id", "bench_id", "common", "n_bench", "containment")
      .collect()
    assert(out.length === 1)
    assert(out(0).getLong(0) === 1L && out(0).getLong(1) === 0L)
    assert(out(0).getLong(2) === 5L && out(0).getLong(3) === 5L)
    assert(out(0).getDouble(4) === 1.0)
  }

  test("gauge capacity keeps exactly the most-recently-updated series (LRU max-size parity)") {
    import org.apache.spark.sql.expressions.Window
    val gauges = Firehose.gaugeLatest(Firehose.metricsFromEvents(spark, sfDir))
    val total = gauges.count()
    val cap = 50
    assert(total > cap, s"need > $cap series for the cap to bite, got $total")
    val capped = Firehose.gaugeCapacity(gauges, maxSeries = cap)
    assert(capped.count() === cap)
    // exactness vs the window-function formulation with the same tie-break
    val w = Window.orderBy(
      col("last_ts").desc, col("component"), col("name"), col("series"))
    val expected = gauges.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= cap).drop("rnk")
      .collect().map(_.toString).sorted.toSeq
    val got = capped.collect().map(_.toString).sorted.toSeq
    assert(got === expected)
  }

  test("count-min sketch heavy hitters bound the exact counts from above") {
    // the mergeable-sketch path for frequency estimation at 100 TB: the
    // sketch aggregates map-side per partition and merges associatively,
    // so frequency estimates cost one pass and fixed memory — unlike the
    // exact groupBy whose state is the key space. CMS guarantees
    // exact <= estimate <= exact + eps * N (with prob >= confidence);
    // fixed seed makes the run deterministic.
    val eps = 0.001
    val events = Firehose.eventsRaw(spark, sfDir)
    val bytes = events
      .agg(count_min_sketch(col("event_type"), lit(eps), lit(0.99), lit(42)))
      .collect()(0).getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    val exact = events.groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    assert(cms.totalCount() === n)
    exact.foreach { case (k, c) =>
      val est = cms.estimateCount(k)
      assert(est >= c, s"CMS under-estimated $k: $est < $c")
      assert(est <= c + (eps * n).toLong + 1,
        s"CMS estimate for $k outside the eps bound: $est vs $c (n=$n)")
    }
  }

  test("DSIR importance resampling selects target-vocabulary documents") {
    // the defining property of importance resampling needs a corpus with a
    // real domain signal (the uniform synthetic testdata has none): target
    // docs speak vocabulary A, the bulk speaks vocabulary B, and a few raw
    // docs secretly speak A — selection must surface exactly the
    // A-speakers, wherever they come from
    import spark.implicits._
    val vocabA = Seq("alpha", "beta", "gamma", "delta")
    val vocabB = Seq("omega", "sigma", "tau", "kappa")
    def text(vocab: Seq[String], seed: Int): String =
      (0 until 30).map(i => vocab((i * 7 + seed) % vocab.length)).mkString(" ")
    val rows =
      (1L to 20L).map(i => (i, text(vocabA, i.toInt), "tgt")) ++
        (21L to 80L).map(i => (i, text(vocabB, i.toInt), "raw")) ++
        (81L to 90L).map(i => (i, text(vocabA, i.toInt), "raw")) // hidden A-speakers
    val docs = rows.toDF("doc_id", "text", "source")
    val selected = graft.operators.Curate
      .dsirSample(docs, targetSource = "tgt", buckets = 64, k = 30)
      .collect()
    assert(selected.length === 30)
    val aSpeakers = (1L to 20L).toSet ++ (81L to 90L).toSet
    val picked = selected.map(_.getAs[Long]("doc_id")).toSet
    assert(picked === aSpeakers,
      s"selection should be exactly the target-vocabulary docs; got $picked")
    // rank order is score-descending and scores are finite
    val byRank = selected.sortBy(_.getAs[Long]("rnk"))
    val scores = byRank.map(_.getAs[Double]("dsir_score"))
    assert(scores.forall(s => !s.isNaN))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "not rank-ordered")
  }

  test("distribution drift: an on-distribution source scores exactly zero KL") {
    import spark.implicits._
    // one source IS the corpus → every bucket ratio is exactly 1, ln 1
    // quantizes to exactly 0, the KL sum is an exact 0
    val mono = Seq((1L, "alpha beta gamma", "s0"), (2L, "beta gamma alpha", "s0"))
      .toDF("doc_id", "text", "source")
    val kl0 = graft.operators.TextAnalysis.distributionDrift(mono, buckets = 64)
      .collect()
    assert(kl0.length === 1 && kl0.head.getAs[Double]("kl_vs_corpus") === 0.0)
    assert(kl0.head.getAs[Long]("n_tokens") === 6L)
    // disjoint vocabularies drift hard in BOTH directions; the bigger
    // source sits closer to the pooled corpus, so it drifts less
    val rows =
      (1L to 8L).map(i => (i, "alpha beta gamma delta", "big")) ++
        (9L to 10L).map(i => (i, "omega sigma tau kappa", "small"))
    val kl = graft.operators.TextAnalysis.distributionDrift(
        rows.toDF("doc_id", "text", "source"), buckets = 64)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("kl_vs_corpus")).toMap
    assert(kl("big") > 0.0 && kl("small") > 0.0)
    assert(kl("small") > kl("big"),
      s"the minority disjoint source must drift more: $kl")
  }

  test("exact-substring dedup strips shared passages and keeps unique text") {
    import spark.implicits._
    val passage = (1 to 8).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (1L, s"a b c $passage d e"),
      (2L, s"$passage x y z"),
      (3L, "q r s t u v w x")).toDF("doc_id", "text")
    val out = graft.operators.Dedup.stripDuplicatePassages(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_dup_spans"), r.getAs[Long]("n_tokens_removed"),
          r.getAs[String]("clean_text")))).toMap
    // the shared 8-gram (and ONLY it — surrounding grams are unshared)
    // vanishes from both carriers; the unique doc is untouched
    assert(out(1L) === ((1L, 8L, "a b c d e")))
    assert(out(2L) === ((1L, 8L, "x y z")))
    assert(out(3L) === ((0L, 0L, "q r s t u v w x")))
  }

  test("DSIR budget sampling takes the most-target-like docs under the token budget") {
    // same planted corpus as the resampling spec: under a 300-token budget
    // (10 docs × 30 tokens) the raw source must contribute exactly its 10
    // hidden target-vocabulary speakers — importance picks WHO, the budget
    // caps HOW MUCH
    import spark.implicits._
    val vocabA = Seq("alpha", "beta", "gamma", "delta")
    val vocabB = Seq("omega", "sigma", "tau", "kappa")
    def text(vocab: Seq[String], seed: Int): String =
      (0 until 30).map(i => vocab((i * 7 + seed) % vocab.length)).mkString(" ")
    val rows =
      (1L to 20L).map(i => (i, text(vocabA, i.toInt), "tgt")) ++
        (21L to 80L).map(i => (i, text(vocabB, i.toInt), "raw")) ++
        (81L to 90L).map(i => (i, text(vocabA, i.toInt), "raw"))
    val docs = rows.toDF("doc_id", "text", "source")
    val sel = graft.operators.Curate
      .dsirBudgetSample(docs, budgets = Map("raw" -> 300L), targetSource = "tgt", buckets = 64)
      .collect()
    assert(sel.map(_.getAs[Long]("doc_id")).toSet === (81L to 90L).toSet,
      "budgeted selection should be exactly the hidden target-vocabulary raw docs")
    assert(sel.forall(r => r.getAs[Long]("cum_tokens") <= r.getAs[Long]("budget")))
  }

  test("q4/q6/correlated/histogram return coherent results at smoke scale") {
    val q4 = Relational.q4OrderPriority(spark, sfDir).collect()
    assert(q4.nonEmpty && q4.forall(_.getLong(1) > 0))
    val q6 = Relational.q6ForecastRevenue(spark, sfDir).collect()
    assert(q6.length === 1)
    val corr = Relational.qCorrelatedAboveAvg(spark, sfDir)
    assert(corr.filter(col("o_totalprice") <= col("cust_avg")).count() === 0)
    val hist = Relational.qHistogram(spark, sfDir)
    val total = hist.agg(sum("n_orders")).collect()(0).getLong(0)
    assert(total === Tables(spark, sfDir, "orders").count())
  }
}
