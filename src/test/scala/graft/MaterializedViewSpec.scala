package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{MaterializedView, Versioned}

/** The incremental-view contract: after ANY source commit sequence, a
  * refreshed view equals a from-scratch recompute BIT-EXACTLY (decimal
  * sums), each refresh is exactly one view commit, and a compact
  * boundary nets out to a watermark-only commit.
  */
class MaterializedViewSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(pfx: String): String =
    Files.createTempDirectory(pfx).toFile.getAbsolutePath

  private def rows(df: DataFrame): Set[(Option[String], Long, Double)] =
    df.select(col("g"), col("cnt"), col("sum_x")).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getDouble(2))).toSet

  private def recompute(src: String): Set[(Option[String], Long, Double)] =
    rows(Versioned.latest(spark, src).groupBy("g")
      .agg(count(lit(1)).as("cnt"),
        sum(col("x").cast("decimal(18,6)")).cast("double").as("sum_x")))

  private def mkSource(root: String, data: Seq[(Long, String, Double)]): Unit =
    Versioned.appendCommit(data.toDF("k", "g", "x").coalesce(1), root,
      bloomCols = Seq("k"))

  test("create equals a full recompute, including a null group") {
    val src = tmp("mv-src"); val view = tmp("mv-view")
    mkSource(src, Seq((1L, "a", 1.5), (2L, "a", 2.0), (3L, "b", 4.0)))
    Versioned.appendCommit(
      Seq((4L, Option.empty[String], 9.0)).toDF("k", "g", "x"), src)
    MaterializedView.create(spark, src, view, Seq("g"), Seq("x"))
    assert(rows(MaterializedView.read(spark, view)) === recompute(src))
    assert(recompute(src).exists(_._1.isEmpty), "null group present")
    // avg derives from the exact sums
    val avg = MaterializedView.read(spark, view)
      .filter(col("g") === "a").select("avg_x").head.getDouble(0)
    assert(avg === 1.75)
  }

  test("byte-identical deltas feed the view correctly (content-address identity)") {
    val src = tmp("mv-src"); val view = tmp("mv-view")
    val batch = Seq((1L, "a", 1.5), (2L, "b", 2.0)).toDF("k", "g", "x").coalesce(1)
    Versioned.appendCommit(batch, src, bloomCols = Seq("k"))
    MaterializedView.create(spark, src, view, Seq("g"), Seq("x"))
    // a byte-identical RE-APPEND dedupes to the same pool path — the
    // feed must still report its rows, doubling every group
    Versioned.appendCommit(batch, src, bloomCols = Seq("k"))
    MaterializedView.refresh(spark, view)
    assert(rows(MaterializedView.read(spark, view)) === recompute(src))
    assert(rows(MaterializedView.read(spark, view))
      === Set((Some("a"), 2L, 3.0), (Some("b"), 2L, 4.0)))
    // a SAME-VALUE upsert collapses the duplicated key to one row (both
    // copies tombstoned, one re-inserted); repeating it is the judge
    // case — tombstone + byte-identical re-append nets to an EMPTY feed,
    // so the second upsert leaves the view untouched
    Versioned.upsertCommit(Seq((1L, "a", 1.5)).toDF("k", "g", "x").coalesce(1),
      src, "k")
    Versioned.upsertCommit(Seq((1L, "a", 1.5)).toDF("k", "g", "x").coalesce(1),
      src, "k")
    MaterializedView.refresh(spark, view)
    assert(rows(MaterializedView.read(spark, view)) === recompute(src))
    assert(rows(MaterializedView.read(spark, view))
      === Set((Some("a"), 1L, 1.5), (Some("b"), 2L, 4.0)))
  }

  test("append + delete + upsert each refresh to the recompute in ONE commit") {
    val src = tmp("mv-src"); val view = tmp("mv-view")
    mkSource(src, Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "b", 3.0)))
    MaterializedView.create(spark, src, view, Seq("g"), Seq("x"))

    // append: new group c, growth in a
    Versioned.appendCommit(
      Seq((4L, "c", 10.0), (5L, "a", 0.5)).toDF("k", "g", "x").coalesce(1),
      src, bloomCols = Seq("k"))
    val h0 = Versioned.history(view).size
    assert(MaterializedView.refresh(spark, view) >= 0)
    assert(Versioned.history(view).size === h0 + 1, "exactly one view commit")
    assert(rows(MaterializedView.read(spark, view)) === recompute(src))

    // caught up: refresh is a no-op, no commit
    val h1 = Versioned.history(view).size
    assert(MaterializedView.refresh(spark, view) === -1L)
    assert(Versioned.history(view).size === h1)

    // delete group c entirely: its view row must disappear
    Versioned.deleteCommit(spark, src, "k", Seq("4"))
    MaterializedView.refresh(spark, view)
    assert(rows(MaterializedView.read(spark, view)) === recompute(src))
    assert(!MaterializedView.read(spark, view).collect()
      .exists(r => r.getString(0) == "c"))

    // upsert: same count, changed sum (dcnt = 0, dsum != 0)
    Versioned.upsertCommit(
      Seq((2L, "b", 20.0)).toDF("k", "g", "x").coalesce(1), src, "k")
    MaterializedView.refresh(spark, view)
    assert(rows(MaterializedView.read(spark, view)) === recompute(src))
    assert(rows(MaterializedView.read(spark, view))
      .contains((Some("b"), 2L, 23.0)))
  }

  test("a compact boundary nets to a watermark-only commit") {
    val src = tmp("mv-src"); val view = tmp("mv-view")
    mkSource(src, Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    Versioned.deleteCommit(spark, src, "k", Seq("1"))
    MaterializedView.create(spark, src, view, Seq("g"), Seq("x"))
    val filesBefore =
      Versioned.manifest(view, Versioned.latestVersion(view)).map(_.path)
    Versioned.compact(spark, src)
    val v = MaterializedView.refresh(spark, view)
    assert(v >= 0, "watermark must advance across the compact")
    assert(Versioned.manifest(view, v).map(_.path) === filesBefore,
      "compact nets out: same view file list, metadata-only commit")
    assert(rows(MaterializedView.read(spark, view)) === recompute(src))
    assert(MaterializedView.refresh(spark, view) === -1L)
  }

  test("a WHERE-filtered view maintains exactly the predicate subset") {
    val src = tmp("mv-src"); val view = tmp("mv-view")
    mkSource(src, Seq((1L, "a", 1.0), (2L, "a", -3.0), (3L, "b", 2.0)))
    MaterializedView.create(spark, src, view, Seq("g"), Seq("x"),
      where = "x > 0")
    def recomputeW: Set[(Option[String], Long, Double)] =
      rows(Versioned.latest(spark, src).filter(col("x") > 0).groupBy("g")
        .agg(count(lit(1)).as("cnt"),
          sum(col("x").cast("decimal(18,6)")).cast("double").as("sum_x")))
    assert(rows(MaterializedView.read(spark, view)) === recomputeW)
    // inserts on both sides of the predicate; only matching rows count
    Versioned.appendCommit(
      Seq((4L, "b", -9.0), (5L, "b", 7.0)).toDF("k", "g", "x").coalesce(1),
      src, bloomCols = Seq("k"))
    MaterializedView.refresh(spark, view)
    assert(rows(MaterializedView.read(spark, view)) === recomputeW)
    assert(rows(MaterializedView.read(spark, view))
      .contains((Some("b"), 2L, 9.0)))
    // deleting a row the predicate excludes is a no-op for the view
    val h = Versioned.history(view).size
    Versioned.deleteCommit(spark, src, "k", Seq("2"))
    MaterializedView.refresh(spark, view)
    assert(rows(MaterializedView.read(spark, view)) === recomputeW)
    // (the watermark still advances — one metadata-or-data commit)
    assert(Versioned.history(view).size === h + 1)
    // deleting a matching row retracts it
    Versioned.deleteCommit(spark, src, "k", Seq("1"))
    MaterializedView.refresh(spark, view)
    assert(rows(MaterializedView.read(spark, view)) === recomputeW)
    assert(!MaterializedView.read(spark, view).collect()
      .exists(r => r.getString(0) == "a"))
  }

  private def rowsMM(df: DataFrame): Set[(Option[String], Long, Double, Double, Double)] =
    df.select(col("g"), col("cnt"), col("sum_x"), col("min_x"), col("max_x"))
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet

  private def recomputeMM(src: String): Set[(Option[String], Long, Double, Double, Double)] =
    rowsMM(Versioned.latest(spark, src).groupBy("g")
      .agg(count(lit(1)).as("cnt"),
        sum(col("x").cast("decimal(18,6)")).cast("double").as("sum_x"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x")))

  test("min/max: inserts self-maintain, a deleted extremum falls to the runner-up") {
    val src = tmp("mv-src"); val view = tmp("mv-view")
    mkSource(src, Seq((1L, "a", 5.0), (2L, "a", 9.0), (3L, "b", 4.0)))
    MaterializedView.create(spark, src, view, Seq("g"), Seq("x"),
      minMaxCols = Seq("x"))
    assert(rowsMM(MaterializedView.read(spark, view)) === recomputeMM(src))
    // insert-only refresh extends the extremes without touching the base
    Versioned.appendCommit(
      Seq((4L, "a", 12.0), (5L, "a", 1.0)).toDF("k", "g", "x").coalesce(1),
      src, bloomCols = Seq("k"))
    MaterializedView.refresh(spark, view)
    assert(rowsMM(MaterializedView.read(spark, view)) === recomputeMM(src))
    assert(rowsMM(MaterializedView.read(spark, view))
      .contains((Some("a"), 4L, 27.0, 1.0, 12.0)))
    // delete the max row: the NON-self-maintainable case — the view must
    // recompute group a from source and land the runner-up (9.0)
    Versioned.deleteCommit(spark, src, "k", Seq("4"))
    MaterializedView.refresh(spark, view)
    assert(rowsMM(MaterializedView.read(spark, view)) === recomputeMM(src))
    assert(rowsMM(MaterializedView.read(spark, view))
      .contains((Some("a"), 3L, 15.0, 1.0, 9.0)))
    // delete ALL of group b: the recompute arm must tombstone it
    Versioned.deleteCommit(spark, src, "k", Seq("3"))
    MaterializedView.refresh(spark, view)
    assert(rowsMM(MaterializedView.read(spark, view)) === recomputeMM(src))
    assert(!MaterializedView.read(spark, view).collect()
      .exists(r => r.getString(0) == "b"))
  }

  test("compact stays metadata-only even with min/max maintained (the lemma)") {
    val src = tmp("mv-src"); val view = tmp("mv-view")
    mkSource(src, Seq((1L, "a", 5.0), (2L, "a", 9.0), (3L, "b", 4.0)))
    Versioned.deleteCommit(spark, src, "k", Seq("1"))
    MaterializedView.create(spark, src, view, Seq("g"), Seq("x"),
      minMaxCols = Seq("x"))
    val filesBefore =
      Versioned.manifest(view, Versioned.latestVersion(view)).map(_.path)
    Versioned.compact(spark, src)
    val v = MaterializedView.refresh(spark, view)
    assert(v >= 0)
    assert(Versioned.manifest(view, v).map(_.path) === filesBefore,
      "delete-all+insert-all cancels under the no-touch lemma")
    assert(rowsMM(MaterializedView.read(spark, view)) === recomputeMM(src))
  }

  test("streaming: per-micro-batch landing + refresh keeps the view exact") {
    val src = tmp("mv-ssrc"); val view = tmp("mv-sview")
    mkSource(src, Seq((1L, "a", 1.0)))
    MaterializedView.create(spark, src, view, Seq("g"), Seq("x"))
    val dir = Files.createTempDirectory("mv-in").toFile
    val chk = Files.createTempDirectory("mv-chk").toFile
    Files.write(dir.toPath.resolve("b1.json"),
      """{"k":2,"g":"a","x":2.5}
        |{"k":3,"g":"b","x":4.0}""".stripMargin.getBytes)
    val stream = spark.readStream
      .schema("k LONG, g STRING, x DOUBLE").json(dir.getAbsolutePath)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          Versioned.appendCommit(batch.coalesce(1), src, bloomCols = Seq("k"))
          MaterializedView.refresh(spark, view)
          ()
        }
      }
      .option("checkpointLocation", chk.getAbsolutePath)
      .start()
    try {
      q.processAllAvailable()
      assert(rows(MaterializedView.read(spark, view)) === recompute(src))
      assert(rows(MaterializedView.read(spark, view))
        .contains((Some("a"), 2L, 3.5)))
      Files.write(dir.toPath.resolve("b2.json"),
        """{"k":4,"g":"b","x":6.0}""".getBytes)
      q.processAllAvailable()
      assert(rows(MaterializedView.read(spark, view)) === recompute(src))
      assert(rows(MaterializedView.read(spark, view))
        .contains((Some("b"), 2L, 10.0)))
      // one landing commit + one view commit per non-empty batch
      assert(Versioned.history(src).length === 3)
      assert(Versioned.history(view).length === 3)
    } finally q.stop()
  }

  test("view over view: a second-order rollup refreshes through both levels") {
    // level 1: per-(g, h) counts+sums over the source; level 2: per-g
    // rollup OVER THE LEVEL-1 TABLE — its change feed is replaceCommit
    // lineage (tombstone + append pairs), which must read back as exact
    // retract/insert deltas for the downstream view
    val src = tmp("mv-src"); val l1 = tmp("mv-l1"); val l2 = tmp("mv-l2")
    Versioned.appendCommit(
      Seq((1L, "a", "x", 1.0), (2L, "a", "y", 2.0), (3L, "b", "x", 4.0))
        .toDF("k", "g", "h", "x").coalesce(1),
      src, bloomCols = Seq("k"))
    MaterializedView.create(spark, src, l1, Seq("g", "h"), Seq("x"))
    MaterializedView.create(spark, l1, l2, Seq("g"), Seq("cnt"))
    def l2rows: Set[(String, Long, Double)] =
      MaterializedView.read(spark, l2)
        .select(col("g"), col("cnt"), col("sum_cnt")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // cnt at level 2 counts level-1 GROUPS; sum_cnt sums their row counts
    assert(l2rows === Set(("a", 2L, 2.0), ("b", 1L, 1.0)))
    // source mutation ripples: new (a, z) group + a delete emptying (b, x)
    Versioned.appendCommit(
      Seq((4L, "a", "z", 8.0)).toDF("k", "g", "h", "x").coalesce(1),
      src, bloomCols = Seq("k"))
    Versioned.deleteCommit(spark, src, "k", Seq("3"))
    MaterializedView.refresh(spark, l1)
    MaterializedView.refresh(spark, l2)
    assert(l2rows === Set(("a", 3L, 3.0)))
    // and an update that only changes a level-1 sum (not cnt) flows as a
    // retract/insert pair whose cnt-delta is zero at level 2
    Versioned.upsertCommit(
      Seq((1L, "a", "x", 10.0)).toDF("k", "g", "h", "x").coalesce(1), src, "k")
    MaterializedView.refresh(spark, l1)
    MaterializedView.refresh(spark, l2)
    assert(l2rows === Set(("a", 3L, 3.0)), "cnt rollup unchanged by a value edit")
  }

  test("fuzz: random append/delete/upsert/compact sequences always refresh exact") {
    val rnd = new scala.util.Random(20260814L)
    val src = tmp("mv-src"); val view = tmp("mv-view")
    val groups = Vector("a", "b", "c", "d")
    var nextK = 0L
    var live = Map.empty[Long, (String, Double)]
    def freshRows(n: Int): Seq[(Long, String, Double)] =
      (0 until n).map { _ =>
        nextK += 1
        val r = (nextK, groups(rnd.nextInt(groups.size)),
          math.round(rnd.nextDouble() * 1000) / 100.0)
        live += r._1 -> ((r._2, r._3)); r
      }
    mkSource(src, freshRows(6))
    MaterializedView.create(spark, src, view, Seq("g"), Seq("x"),
      minMaxCols = Seq("x"))
    for (step <- 0 until 12) {
      rnd.nextInt(4) match {
        case 0 => // append 1-3 rows
          Versioned.appendCommit(freshRows(rnd.nextInt(3) + 1)
            .toDF("k", "g", "x").coalesce(1), src, bloomCols = Seq("k"))
        case 1 if live.nonEmpty => // delete 1-2 live keys
          val doomed = rnd.shuffle(live.keys.toSeq).take(rnd.nextInt(2) + 1)
          doomed.foreach(k => live -= k)
          Versioned.deleteCommit(spark, src, "k", doomed.map(_.toString).sorted)
        case 2 if live.nonEmpty => // upsert: move a key to a new group/value
          val k = rnd.shuffle(live.keys.toSeq).head
          val r = (k, groups(rnd.nextInt(groups.size)),
            math.round(rnd.nextDouble() * 1000) / 100.0)
          live += k -> ((r._2, r._3))
          Versioned.upsertCommit(Seq(r).toDF("k", "g", "x").coalesce(1), src, "k")
        case _ =>
          Versioned.compact(spark, src)
      }
      MaterializedView.refresh(spark, view)
      val model = live.toSeq.groupBy(_._2._1).map { case (g, rs) =>
        val xs = rs.map(_._2._2)
        (Option(g), rs.size.toLong, xs.map(BigDecimal(_)).sum.toDouble,
          xs.min, xs.max)
      }.toSet
      assert(rowsMM(MaterializedView.read(spark, view)) === model, s"step $step")
    }
  }

  test("refresh cleans up its stage landings (stageDir does not grow)") {
    // the single-table flavor routes staging through the same shared
    // Ivm.Stages core the join view uses — durable while the refresh
    // runs, dropped once its commit has published
    val src = tmp("mv-stage-src"); val view = tmp("mv-stage-view")
    val stageDir = tmp("mv-stage-stage")
    spark.conf.set("spark.graft.stageDir", stageDir)
    try {
      mkSource(src, Seq((1L, "a", 1.5), (2L, "a", 2.0), (3L, "b", 4.0)))
      MaterializedView.create(spark, src, view, Seq("g"), Seq("x"),
        minMaxCols = Seq("x"))
      mkSource(src, Seq((4L, "b", 6.0)))
      // a delete span exercises the recompute arm's stage too
      Versioned.deleteCommit(spark, src, "k", Seq("1"))
      MaterializedView.refresh(spark, view)
      val got = MaterializedView.read(spark, view)
        .select(col("g"), col("cnt"), col("sum_x"), col("min_x"), col("max_x"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4))).toSet
      assert(got === Set(("a", 1L, 2.0, 2.0, 2.0), ("b", 2L, 10.0, 4.0, 6.0)))
      assert(new java.io.File(stageDir).list().isEmpty,
        "stage landings leaked after refresh")
    } finally spark.conf.unset("spark.graft.stageDir")
  }
}
