package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.{AsOf, Dedup, Relational, Similarity}

class OperatorSpec extends SparkSuite {

  test("asof backward join picks latest right row at or before left ts") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 205L, "p2"), (2L, 50L, "p3"))
      .toDF("user_id", "ts", "pid")
    val right = Seq((1L, 100L, 7.0), (1L, 200L, 8.0), (1L, 300L, 9.0), (3L, 10L, 1.0))
      .toDF("user_id", "ts", "v")
    val out: Map[String, (Option[Any], Option[Any])] =
      AsOf.backward(left, right, Seq("user_id"), "ts", Seq("v"), "r_")
        .select("pid", "r_ts", "r_v").collect()
        .map(r => r.getString(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(out("p1") === ((Some(100L), Some(7.0)))) // equal ts matches
    assert(out("p2") === ((Some(200L), Some(8.0)))) // latest ≤ 205
    assert(out("p3") === ((None, None)))            // no right rows for user 2
  }

  test("asof forward join picks earliest right row at or after left ts") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 205L, "p2"), (2L, 50L, "p3"))
      .toDF("user_id", "ts", "pid")
    val right = Seq((1L, 100L, 7.0), (1L, 200L, 8.0), (1L, 300L, 9.0), (3L, 10L, 1.0))
      .toDF("user_id", "ts", "v")
    val out: Map[String, (Option[Any], Option[Any])] =
      AsOf.forward(left, right, Seq("user_id"), "ts", Seq("v"), "r_")
        .select("pid", "r_ts", "r_v").collect()
        .map(r => r.getString(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(out("p1") === ((Some(100L), Some(7.0)))) // equal ts matches
    assert(out("p2") === ((Some(300L), Some(9.0)))) // earliest ≥ 205
    assert(out("p3") === ((None, None)))            // no right rows for user 2
  }

  test("ngram jaccard and minhash LSH agree on planted near-duplicates") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e f g h i j k l"),
      (1L, "a b c d e f g h i j k z"),  // near-dup of 0 (jaccard 9/11)
      (2L, "q w e r t y u i o p a s"),
      (3L, "z x c v b n m k j h g f"),
      (4L, "a b c d e f g h i j k l")) // exact dup of 0 (jaccard 1)
      .toDF("doc_id", "text")
    val exact = Dedup.ngramJaccard(docs, threshold = 0.4)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact === Set((0L, 1L), (0L, 4L), (1L, 4L)))
    val lsh = Dedup.minhashLsh(docs, threshold = 0.4)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // identical docs collide in every band — guaranteed; near-dups are
    // probabilistic (P≈0.83 at j=0.82 with 3 bands × 4 rows) — subset only
    assert(lsh.contains((0L, 4L)))
    assert(lsh.subsetOf(exact))
  }

  test("cluster resolution finds connected components and survivors (both paths)") {
    import spark.implicits._
    // chain 1-2-3 plus pair 7-9: components {1,2,3}→1 and {7,9}→7
    val pairs = Seq((1L, 2L), (2L, 3L), (9L, 7L)).toDF("doc_a", "doc_b")
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L)
    val local = Dedup.resolveClusters(pairs).as[(Long, Long)].collect().toMap
    assert(local === expect)
    // force the distributed Pregel path
    val dist = Dedup.resolveClusters(pairs, maxLocalEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(dist === expect)
  }

  test("simhash pairs finds identical docs at hamming 0") {
    import spark.implicits._
    val docs = Seq(
      (0L, "spark sql engine fast shuffle"),
      (1L, "spark sql engine fast shuffle"),
      (2L, "completely different words here now"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, radius = 0)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 1L)))
  }

  test("brute-force ANN ranks by cosine desc and excludes self") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(0.0f, 1.0f), 0),
      (3L, Array(-1.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" === 0), k = 2)
      .orderBy("rnk").select("neighbor_id").as[Long].collect()
    assert(out.toSeq === Seq(1L, 2L))
  }

  test("LSH ANN returns a subset of correctly-scored neighbors (recall measured)") {
    val emb = Tables(spark, sfDir, "embeddings")
    val probes = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, probes, k = 5)
      .select("probe_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(emb, probes, k = 5)
      .select("probe_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.nonEmpty, "LSH should produce candidates")
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"LSH recall vs exact top-5: $recall%.2f (random-ish vectors)")
    assert(recall > 0.0)
  }

  test("IVF ANN recall at defaults stays above the floor") {
    val emb = Tables(spark, sfDir, "embeddings")
    val probes = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, probes, k = 5)
      .select("probe_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, probes, k = 5)
      .select("probe_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.nonEmpty)
    val recall = (exact intersect ivf).size.toDouble / exact.size
    info(f"IVF recall vs exact top-5 (nlist=16, nprobe=4): $recall%.2f")
    // near-uniform random vectors are IVF's worst case (no cluster
    // structure); the default nprobe must still clear this floor — the
    // training sample and k-means seed are fixed, so the value is
    // deterministic, and the floor guards the defaults, not flakiness
    assert(recall >= 0.6, f"IVF recall $recall%.2f below the 0.6 floor at defaults")
  }

  test("IVF search from a landed index matches the one-shot form without a corpus re-scan") {
    // the deployment shape: the cell assignment is written once by ingest
    // and searches read the landed index — results must be identical to the
    // build-and-search form, and the landed search must not touch the raw
    // embeddings table at all
    val emb = Tables(spark, sfDir, "embeddings")
    val probes = emb.filter(col("vec_id") < 10)
    val index = Similarity.ivfIndex(emb)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toFile.getAbsolutePath + "/idx"
    index.assigned.write.parquet(dir)
    val landed = Similarity.IvfIndex(index.centroids, spark.read.parquet(dir))
    val direct = Similarity.ivfTopK(emb, probes, k = 5)
      .collect().map(_.toString).sorted.toSeq
    val fromLanded = Similarity.ivfSearch(landed, probes, k = 5)
    assert(fromLanded.collect().map(_.toString).sorted.toSeq === direct)
    // the probe side reads embeddings; the corpus side must read ONLY the
    // landed index files
    val scans = fromLanded.queryExecution.sparkPlan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metadata.get("Location").map(_.toString).getOrElse("")
    }
    assert(scans.count(_.contains("embeddings.parquet")) === 1, // probes only
      s"corpus re-scanned in the landed search: $scans")
    assert(scans.exists(_.contains("idx")), s"landed index not read: $scans")
  }

  test("IVF SemDeDup: weight conserved, removals sound, recall floored, deterministic") {
    val emb = Tables(spark, sfDir, "embeddings")
    val n = emb.count()
    val out = Dedup.semDedupIvf(emb).collect()
    // weight conservation — exact regardless of what the clustering found
    assert(out.map(_.getLong(2)).sum === n, "survivor weights must sum to the corpus")
    // determinism: the fit is a seeded reservoir sample + seeded Lloyd, so
    // two runs are byte-identical
    val again = Dedup.semDedupIvf(emb).collect()
    assert(out.toSeq === again.toSeq)
    // soundness (a theorem, asserted exactly): every within-cell pair the
    // IVF form scores passes the SAME exact cosine predicate, so its pair
    // set is a SUBSET of the all-pairs truth — removals can only be a
    // subset of the exact form's removals, never a false removal
    val truth = Dedup.semDedup(emb.withColumn("_one", lit(0)), "_one")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ivfKept = out.map(_.getLong(0)).toSet
    val allIds = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    val removedTrue = allIds -- truth
    val removedIvf = allIds -- ivfKept
    assert((removedIvf -- removedTrue).isEmpty,
      s"IVF removed vectors the all-pairs truth keeps: ${removedIvf -- removedTrue}")
    // worst-case-data recall, pinned not floored high: near-uniform random
    // vectors at the permissive 0.35 threshold are IVF's pathological case
    // ("duplicates" spread across the whole space with no cluster
    // structure — same caveat as the ANN recall tests); deterministic
    // value at the fixed sample + seed
    assume(removedTrue.nonEmpty)
    val recall = removedIvf.size.toDouble / removedTrue.size
    info(f"IVF SemDeDup removal recall vs all-pairs (worst-case corpus): $recall%.2f " +
      s"(${removedIvf.size}/${removedTrue.size})")
    assert(recall >= 0.35, f"worst-case removal recall $recall%.2f below the 0.35 floor")
    // the within-cell self-join must be an equi-join, never a cartesian
    val plan = Dedup.semDedupIvf(emb).queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), "cell self-join fell to a cartesian product")
  }

  test("IVF SemDeDup co-locates planted near-duplicate clusters (deployment-shape recall)") {
    import spark.implicits._
    // the semantics the operator is FOR: near-dups are near-IDENTICAL
    // (tiny perturbations, cosine ≥ ~0.99) — a perturbed copy lands in its
    // base vector's cell unless the base sits exactly on a Voronoi edge,
    // so cell blocking must recover nearly every planted duplicate
    val rnd = new scala.util.Random(7L)
    val dim = 16
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val nrm = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / nrm).toFloat)
    }
    val bases = Array.fill(120)(unit())
    val rows = bases.zipWithIndex.flatMap { case (b, i) =>
      val copies = if (i % 3 == 0) 2 else 0 // 40 planted clusters of size 3
      (0 to copies).map { c =>
        val v = b.zipWithIndex.map { case (x, j) =>
          (x + (if (c == 0) 0.0 else 0.01 * rnd.nextGaussian())).toFloat }
        (i.toLong * 10 + c, v, 0)
      }
    }.toSeq
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = Dedup.semDedupIvf(emb, targetCell = 16, threshold = 0.9).collect()
    val kept = out.map(_.getLong(0)).toSet
    val planted = rows.map(_._1).filter(_ % 10 != 0).toSet // the perturbed copies
    val removed = rows.map(_._1).toSet -- kept
    val plantedRecall = (removed intersect planted).size.toDouble / planted.size
    info(f"planted near-dup recall: $plantedRecall%.2f (${(removed intersect planted).size}/${planted.size})")
    assert(plantedRecall >= 0.9,
      f"planted recall $plantedRecall%.2f below the 0.9 floor — cells split near-identical vectors")
  }

  test("ivfNlist grows with the corpus and is bounded at both ends") {
    assert(Dedup.ivfNlist(0L, 256) === 8)
    assert(Dedup.ivfNlist(2048L, 256) === 9)
    assert(Dedup.ivfNlist(1000000L, 256) === 3907)
    // the 100 TB end: the centroid-literal cap, not a data-derived value
    assert(Dedup.ivfNlist(100000000000L, 256) === 65536)
  }

  test("IVF-PQ refined recall at defaults stays above the floor") {
    val emb = Tables(spark, sfDir, "embeddings")
    val probes = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, probes, k = 5)
      .select("probe_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val index = Similarity.ivfPqIndex(emb)
    val adc = Similarity.ivfPqSearch(index, probes, k = 5)
      .select("probe_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val refined = Similarity.ivfPqRefine(index, emb, probes, k = 5)
      .select("probe_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adcRecall = (exact intersect adc).size.toDouble / exact.size
    val refRecall = (exact intersect refined).size.toDouble / exact.size
    info(f"IVF-PQ recall vs exact top-5: ADC-only $adcRecall%.2f, refined $refRecall%.2f")
    // near-uniform random vectors are the PQ worst case (neighbor cosine
    // gaps are tiny, so 4-bit quantization error swamps pure ADC ranking);
    // the refine stage re-scores only the ADC shortlist exactly and must
    // recover most of the exact set. Sample, seeds, and tie-breaks are all
    // fixed, so both values are deterministic — the floors guard the
    // defaults, not flakiness.
    assert(adcRecall >= 0.3, f"ADC-only recall $adcRecall%.2f below the 0.3 floor")
    assert(refRecall >= 0.7, f"refined recall $refRecall%.2f below the 0.7 floor")
  }

  test("IVF-PQ search from a landed index matches the one-shot form and carries no vectors") {
    val emb = Tables(spark, sfDir, "embeddings")
    val probes = emb.filter(col("vec_id") < 10)
    val index = Similarity.ivfPqIndex(emb)
    // the index relation is scalar-only: id, cell, one packed code long,
    // one norm double — this is the ≈20-byte row that replaces a 256-byte
    // float32 vector at search time
    assert(!index.encoded.schema.fields.exists(
      _.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]),
      s"encoded index must not carry vector columns: ${index.encoded.schema}")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toFile.getAbsolutePath + "/idx"
    index.encoded.write.parquet(dir)
    val landed = Similarity.IvfPqIndex(
      index.centroids, index.codebooks, spark.read.parquet(dir))
    val direct = Similarity.ivfPqSearch(index, probes, k = 5)
      .collect().map(_.toString).sorted.toSeq
    val fromLanded = Similarity.ivfPqSearch(landed, probes, k = 5)
    assert(fromLanded.collect().map(_.toString).sorted.toSeq === direct)
    // the probe side reads embeddings; the ADC corpus side must read ONLY
    // the landed index files
    val scans = fromLanded.queryExecution.sparkPlan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metadata.get("Location").map(_.toString).getOrElse("")
    }
    assert(scans.count(_.contains("embeddings.parquet")) === 1, // probes only
      s"corpus re-scanned in the landed ADC search: $scans")
    assert(scans.exists(_.contains("idx")), s"landed index not read: $scans")
    // compression: the landed PQ index must be a small fraction of the raw
    // float32 corpus (64 dims × 4 B = 256 B/vector vs ~20 B/row here)
    def bytesUnder(p: java.io.File): Long =
      if (p.isDirectory) p.listFiles().map(bytesUnder).sum else p.length()
    val idxBytes = bytesUnder(new java.io.File(dir))
    val rawBytes = bytesUnder(new java.io.File(s"$sfDir/embeddings.parquet"))
    info(f"landed IVF-PQ index: $idxBytes%d B vs raw corpus $rawBytes%d B")
    assert(idxBytes * 4 < rawBytes,
      s"PQ index ($idxBytes B) should be <1/4 of the raw corpus ($rawBytes B)")
  }

  test("IVF-PQ append encodes with the frozen model exactly as the original build") {
    // the FAISS add() shape: a delta batch encodes against the landed
    // index's FROZEN model (no refit, no corpus re-read) and must produce
    // byte-identical rows to the from-scratch build — so append ∪ landed
    // searches identically to the full index
    val emb = Tables(spark, sfDir, "embeddings")
    val index = Similarity.ivfPqIndex(emb)
    val delta = emb.filter(col("vec_id") % 2 === 0)
    val appended = Similarity.ivfPqEncodeWith(index, delta)
      .collect().map(_.toString).sorted.toSeq
    val fromBuild = index.encoded.filter(col("neighbor_id") % 2 === 0)
      .collect().map(_.toString).sorted.toSeq
    assert(appended === fromBuild)
    val union = Similarity.IvfPqIndex(index.centroids, index.codebooks,
      index.encoded.filter(col("neighbor_id") % 2 =!= 0)
        .unionByName(Similarity.ivfPqEncodeWith(index, delta)))
    val probes = emb.filter(col("vec_id") < 10)
    assert(
      Similarity.ivfPqSearch(union, probes, k = 5).collect().map(_.toString).sorted.toSeq ===
        Similarity.ivfPqSearch(index, probes, k = 5).collect().map(_.toString).sorted.toSeq)
  }

  test("filtered IVF-PQ pushes the metadata predicate into the landed index scan") {
    // payload filtering, the production vector-store shape: metadata lands
    // IN the compact index, a search predicate restricts candidates BEFORE
    // ADC scoring, and on a landed index the predicate reaches the parquet
    // reader as a pushed filter — never a post-scan candidate cull
    val emb = Tables(spark, sfDir, "embeddings")
    val probes = emb.filter(col("vec_id") < 10)
    val index = Similarity.ivfPqIndex(emb, metaCols = Seq("label"))
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-f").toFile.getAbsolutePath + "/idx"
    index.encoded.write.parquet(dir)
    val landed = Similarity.IvfPqIndex(
      index.centroids, index.codebooks,
      spark.read.parquet(dir).filter(col("label") < 5))
    val out = Similarity.ivfPqRefine(landed, emb, probes, k = 5)
    val rows = out.collect()
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.nonEmpty)
    assert(rows.forall(r => labels(r.getAs[Long]("neighbor_id")) < 5),
      "a neighbor escaped the metadata predicate")
    val exact = Similarity.bruteForceTopK(emb.filter(col("label") < 5), probes, k = 5)
      .select("probe_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    info(f"filtered IVF-PQ refined recall vs filtered exact top-5: $recall%.2f")
    assert(recall >= 0.6, f"filtered recall $recall%.2f below the 0.6 floor")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("LessThan(label,5)"),
      s"label predicate not pushed to the index scan:\n${plan.take(2000)}")
  }

  test("int8 quantized ANN keeps high agreement with the f32 exact top-k") {
    val emb = Tables(spark, sfDir, "embeddings")
    val probes = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, probes, k = 5)
      .select("probe_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val q = Similarity.bruteForceTopKInt8(emb, probes, k = 5)
      .select("probe_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(q.size === exact.size, "int8 path must return a full top-k per probe")
    val recall = (exact intersect q).size.toDouble / exact.size
    info(f"int8 recall vs f32 exact top-5: $recall%.2f")
    // int8 symmetric quantization perturbs cosines by ~1/127 per dim —
    // on these vectors the top-5 sets should overlap strongly; the floor
    // is deterministic (no randomness anywhere in either path)
    assert(recall >= 0.8, f"int8 recall $recall%.2f below the 0.8 floor")
  }

  test("hard negatives exclude the probe's own label and rank by similarity") {
    val emb = Tables(spark, sfDir, "embeddings")
    val probes = emb.filter(col("vec_id") < 10)
    val out = Similarity.hardNegatives(emb, probes, k = 5)
    // no same-label pair survives
    assert(out.filter(col("cand_label") === col("probe_label")).count() === 0)
    // exactly k per probe (the corpus has ample cross-label candidates)
    val perProbe = out.groupBy("probe_id").count().collect()
    assert(perProbe.nonEmpty && perProbe.forall(_.getLong(1) === 5))
    // the mined negatives really are the hardest: a driver-side brute
    // force over ALL cross-label candidates (same fold order as
    // Kernels.cosine, so doubles are bit-identical) must produce the same
    // top-5 ids in the same order for every probe
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val corpus = emb.select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val expected = corpus.filter(_._1 < 10).map { case (pid, plabel, pemb) =>
      pid -> corpus.filter(_._2 != plabel)
        .map { case (cid, _, cemb) => (cid, cos(pemb, cemb)) }
        .sortBy { case (cid, c) => (-c, cid) }.take(5).map(_._1).toSeq
    }.toMap
    val mined = out.select("probe_id", "neighbor_id", "rnk").collect()
      .groupBy(_.getLong(0))
      .map { case (pid, rows) =>
        pid -> rows.sortBy(_.getLong(2)).map(_.getLong(1)).toSeq
      }
    assert(mined === expected,
      s"mined negatives differ from brute-force top-5: $mined vs $expected")
  }

  test("approx_percentile tracks exact percentiles within the accuracy bound") {
    val exact = Relational.qPercentiles(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = Relational.qPercentilesApprox(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    exact.foreach { case (k, (e25, e50, e75)) =>
      val (a25, a50, a75) = approx(k)
      // GK returns an actual data value near the requested rank; at this
      // accuracy the relative error on a smooth distribution stays small
      Seq((e25, a25), (e50, a50), (e75, a75)).foreach { case (e, a) =>
        assert(math.abs(a - e) / e < 0.05, s"priority $k: exact $e vs approx $a")
      }
    }
  }

  test("quality model agrees with the heuristic labels it distills") {
    val docs = Tables(spark, sfDir, "documents")
    val out = graft.operators.TextAnalysis.qualityModel(docs).collect()
    assert(out.length === docs.count())
    // probabilities are probabilities
    assert(out.forall { r =>
      val p = r.getAs[Double]("prob_good"); p >= 0.0 && p <= 1.0
    })
    // a linear model over the same features the heuristic combines almost
    // linearly must reproduce its labels on in-distribution data
    val agree = out.count(r =>
      r.getAs[Int]("model_pred") == r.getAs[Int]("heuristic_label"))
    val rate = agree.toDouble / out.length
    info(f"model/heuristic agreement: $rate%.3f")
    assert(rate >= 0.85, f"agreement $rate%.3f below 0.85")
  }

  test("approx_count_distinct tracks exact within rsd bound") {
    val exact = Relational.qDistinct(spark, sfDir)
      .select("o_orderpriority", "n_custs").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Relational.qDistinctApprox(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, v) =>
      assert(math.abs(approx(k) - v).toDouble / v < 0.15, s"priority $k: $v vs ${approx(k)}")
    }
  }

  test("repetition stats flag phrase-dominated docs and keep short docs null") {
    import spark.implicits._
    val docs = Seq(
      (0L, "buy now buy now buy now buy now buy now"), // one bigram dominates
      (1L, "the quick brown fox jumps over a lazy dog"), // all grams unique
      (2L, "hi"),                                        // too short for any gram
      (3L, "")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.repetitionStats(docs, flagShare = 0.2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 0: 10 words, bigrams: "buy now"×5, "now buy"×4 → top share 5/9
    assert(out(0L).getAs[Double]("top_bigram_share") === 5.0 / 9.0)
    assert(out(0L).getAs[Int]("repetitive") === 1)
    assert(out(0L).getAs[Double]("dup_word_ratio") === 1.0 - 2.0 / 10.0)
    // doc 1: every bigram unique → share 1/8, not flagged
    assert(out(1L).getAs[Double]("top_bigram_share") === 1.0 / 8.0)
    assert(out(1L).getAs[Int]("repetitive") === 0)
    // docs 2/3 survive with null shares (left join), unflagged
    assert(out(2L).isNullAt(out(2L).fieldIndex("top_bigram_share")))
    assert(out(2L).getAs[Int]("repetitive") === 0)
    assert(out(3L).isNullAt(out(3L).fieldIndex("dup_word_ratio")))
  }

  test("stratified split hits exact per-stratum proportions and is partition-invariant") {
    val docs = Tables(spark, sfDir, "documents")
    val out = graft.operators.Curate.stratifiedSplit(docs)
    val bySplit = out.groupBy("source", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val perSource = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perSource.foreach { case (src, n) =>
      val train = bySplit.getOrElse((src, "train"), 0L)
      val v = bySplit.getOrElse((src, "val"), 0L)
      assert(train === math.ceil(n * 0.8).toLong, s"$src train")
      assert(v === math.ceil(n * 0.1).toLong, s"$src val")
      assert(bySplit.getOrElse((src, "test"), 0L) === n - train - v, s"$src test")
    }
    // membership is a pure function of doc_id — repartitioning the input
    // must not migrate any document between splits
    val again = graft.operators.Curate.stratifiedSplit(docs.repartition(7))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = out.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(first === again)
  }

  test("token-budget sample respects budgets, excludes unlisted sources, partition-invariant") {
    val docs = Tables(spark, sfDir, "documents")
    val budgets = Map("src0" -> 3000L, "src1" -> 2000L, "src2" -> 1000L)
    val out = graft.operators.Curate.tokenBudgetSample(docs, budgets).collect()
    // every kept doc's cumulative total is within its source's budget
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Long]("cum_tokens") <= r.getAs[Long]("budget")))
    // unlisted source excluded
    assert(!out.exists(_.getAs[String]("source") == "src3"))
    // the take is maximal-prefix: per source, kept tokens + the NEXT doc's
    // tokens would exceed the budget (unless the source ran out of docs)
    val perSource = out.groupBy(_.getAs[String]("source"))
    val totalDocs = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perSource.foreach { case (src, rows) =>
      val kept = rows.map(_.getAs[Long]("cum_tokens")).max
      val full = rows.length.toLong === totalDocs(src)
      assert(full || kept <= budgets(src))
    }
    // membership is partitioning-independent
    val again = graft.operators.Curate.tokenBudgetSample(docs.repartition(7), budgets)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === out.map(_.getAs[Long]("doc_id")).toSet)
  }

  test("int8 quantization bounds values and reconstruction error") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (1L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // all-zero vector
      (2L, Array(-2.0f, 2.0f, 1.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(emb).collect()
      .map(r => r.getAs[Long]("vec_id") -> r).toMap
    // zero vector: scale 0, all-zero codes, zero error
    assert(out(1L).getAs[Double]("scale") === 0.0)
    assert(out(1L).getAs[String]("q_csv") === "0,0,0,0")
    assert(out(1L).getAs[Double]("mean_abs_err") === 0.0)
    // max-magnitude component always maps to ±127; every code in range
    assert(out(0L).getAs[String]("q_csv") === "127,-64,32,0")
    assert(out(2L).getAs[String]("q_csv").split(",").map(_.toInt).forall(q => q.abs <= 127))
    // error bound: round-to-nearest ⇒ per-dim error ≤ scale/2
    out.values.foreach { r =>
      assert(r.getAs[Double]("mean_abs_err") <= r.getAs[Double]("scale") / 2 + 1e-12)
    }
  }

  test("snapshot diff classifies added/removed/changed and drops unchanged") {
    import spark.implicits._
    val oldSnap = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val newSnap = Seq((2L, "beta"), (3L, "gamma v2"), (4L, "delta")).toDF("doc_id", "text")
    val out = graft.operators.Curate.snapshotDiff(oldSnap, newSnap)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("table profile reports per-column nulls, distincts and typed min/max") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None), (None, Some("c")), (Some(2L), Some("a")))
      .toDF("k", "s")
    val out = Relational.tableProfile(df, Seq("k", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val k = out("k")
    assert(k.getAs[Long]("n_rows") === 4L && k.getAs[Long]("n_nulls") === 1L)
    assert(k.getAs[Long]("n_distinct") === 2L)
    assert(k.getAs[Double]("min_num") === 1.0 && k.getAs[Double]("max_num") === 2.0)
    assert(k.isNullAt(k.fieldIndex("min_str")))
    val s = out("s")
    assert(s.getAs[Long]("n_nulls") === 1L && s.getAs[Long]("n_distinct") === 2L)
    assert(s.getAs[String]("min_str") === "a" && s.getAs[String]("max_str") === "c")
    assert(s.isNullAt(s.fieldIndex("min_num")))
  }

  test("predict_linear recovers an exact linear trend and filters degenerate series") {
    import spark.implicits._
    // series a: y = 2t + 5 exactly; b: one sample (n < 2); c: all samples
    // at one timestamp (zero x-variance → den = 0)
    val pts = Seq(
      ("a", 1000L, 2005.0), ("a", 1010L, 2025.0), ("a", 1020L, 2045.0),
      ("b", 500L, 1.0),
      ("c", 700L, 1.0), ("c", 700L, 2.0))
      .toDF("series", "ts_s", "value")
    val out = graft.operators.Firehose
      .predictLinear(pts, Seq("series"), col("ts_s"), col("value"), horizonSec = 10)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("a"))
    assert(math.abs(out("a").getAs[Double]("slope") - 2.0) < 1e-9)
    // newest sample is t=1020 → predicted at t=1030: 2·1030 + 5 = 2065
    assert(math.abs(out("a").getAs[Double]("predicted") - 2065.0) < 1e-9)
  }

  test("gopher rules keep well-formed prose and flag short/symbol/non-alpha docs") {
    import spark.implicits._
    val docs = Seq(
      // 60 words, two distinct stopwords, all-alpha, mean word len ~4.9
      (1L, "the and " + Seq.fill(58)("alpha").mkString(" ")),
      (2L, "tiny doc the and"), // word-count floor
      (3L, "the and " + Seq.fill(48)("alpha").mkString(" ") + " " +
        Seq.fill(10)("###").mkString(" ")), // symbol ratio 10/60 > 0.1
      (4L, "the and " + Seq.fill(58)("12345").mkString(" "))) // alpha ratio 2/60
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.gopherRules(docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("keep")).toMap
    assert(out === Map(1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("custom expressions are SQL-registered via extensions") {
    val r = spark.sql(
      "SELECT cosine_sim(array(cast(1.0 as float), cast(0.0 as float)), " +
        "array(cast(1.0 as float), cast(0.0 as float))) c, " +
        "poly_fingerprint('abc') f, md5_prefix60('abc') h").collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getLong(2) === 648541476951500027L)
  }

  test("mergeUpsert applies U/D on matched keys, I on unmatched, no-ops the rest") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val changes = Seq(
      (1L, "U", "a2", 11.0), // matched update
      (2L, "D", "b", 20.0),  // matched delete
      (4L, "I", "d", 40.0),  // unmatched insert
      (3L, "I", "c9", 99.0), // matched insert → no-op (keeps base row)
      (5L, "U", "e", 50.0),  // unmatched update → no-op
      (6L, "D", "f", 60.0))  // unmatched delete → no-op
      .toDF("k", "op", "name", "v")
    val out = graft.operators.Curate.mergeUpsert(base, changes, "k")
      .as[(Long, String, Double)].collect().toSet
    assert(out === Set((1L, "a2", 11.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("contaminationStats reports 0 for clean and 1 for fully-contained bench docs") {
    import spark.implicits._
    val corpus = Seq((0L, "a b c d e f")).toDF("doc_id", "text")
    val bench = Seq(
      (10L, "a b c d e f"), // every 3-gram appears in the corpus
      (11L, "q w e r t y"), // disjoint vocabulary
      (12L, "a b c x y z")) // exactly one shared 3-gram ("a b c") of four
      .toDF("doc_id", "text")
    val out = Dedup.contaminationStats(corpus, bench)
      .select("bench_id", "n_grams", "n_contaminated", "contamination")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(10L) === ((10L, 4L, 4L, 1.0)))
    assert(out(11L) === ((11L, 4L, 0L, 0.0)))
    assert(out(12L) === ((12L, 4L, 1L, 0.25)))
  }

  test("hybridRrf ranks a both-lists doc first and keeps single-list docs") {
    import spark.implicits._
    val docs = Seq(
      (0L, "spark stream merge window"), // strongest lexical hit
      (1L, "spark spark spark"),
      (2L, "nothing relevant here"),     // lexical miss
      (3L, "window probe text")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, 0, Seq(1.0f, 0.0f)),  // aligned with the probe → vector rank 1
      (1L, 0, Seq(0.9f, 0.1f)),
      (2L, 0, Seq(0.0f, 1.0f)),  // orthogonal → vector rank 3
      (3L, 1, Seq(1.0f, 0.05f))) // the probe itself (excluded as candidate)
      .toDF("vec_id", "label", "embedding")
    val rows = Similarity.hybridRrf(
        docs, emb, Seq("spark", "stream", "merge", "window"), probeVecId = 3L)
      .collect()
    // doc 0 is rank 1 lexically AND rank 1 in the vector list → top fusion
    assert(rows.head.getAs[Long]("id") === 0L)
    assert(rows.head.getAs[Long]("lex_rank") === 1L)
    assert(rows.head.getAs[Long]("vec_rank") === 1L)
    // doc 2 appears only in the vector list: null lex_rank, still fused
    val d2 = rows.find(_.getAs[Long]("id") == 2L).get
    assert(d2.isNullAt(d2.fieldIndex("lex_rank")))
    assert(d2.getAs[Long]("vec_rank") === 3L)
    // rrf is monotone in the fused ranks
    val rrfs = rows.map(_.getAs[Double]("rrf"))
    assert(rrfs.sameElements(rrfs.sortBy(-_)))
  }

  test("expectationSuite flags each planted violation and passes clean checks") {
    import spark.implicits._
    val t0: Option[java.sql.Timestamp] = Some(java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
    val li = Seq(
      (1L, 1, 5.0, "A", t0, 10.0),   // clean
      (1L, 1, 5.0, "A", t0, 10.0),   // duplicate (orderkey, linenumber)
      (1L, 2, 99.0, "N", t0, 20.0),  // quantity out of range
      (1L, 3, 5.0, "X", t0, 20.0),   // returnflag outside domain
      (1L, 4, 5.0, "R", None, 20.0), // null shipdate
      (2L, 1, 5.0, "A", t0, -5.0))   // negative price + orphan orderkey
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
        "l_shipdate", "l_extendedprice")
    val ord = Seq(1L).toDF("o_orderkey")
    val out = Relational.expectationSuite(li, ord)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out === Map(
      "dup_primary_key" -> ((1L, 0L)),
      "empty_table" -> ((0L, 1L)),
      "extendedprice_positive" -> ((1L, 0L)),
      "orderkey_ref_integrity" -> ((1L, 0L)),
      "quantity_in_range" -> ((1L, 0L)),
      "returnflag_in_domain" -> ((1L, 0L)),
      "shipdate_not_null" -> ((1L, 0L))))
  }
}
