package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{MaterializedJoinView, Versioned}

/** The join-view contract: after any commit sequence on EITHER side, a
  * refreshed view equals the from-scratch join+group recompute
  * bit-exactly, via the signed delta identity
  * ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB.
  */
class MaterializedJoinViewSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  private def rows(view: String): Set[(Long, Long, Double)] =
    MaterializedJoinView.read(spark, view)
      .select(col("tier"), col("cnt"), col("sum_x")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def recompute(left: String, right: String): Set[(Long, Long, Double)] =
    Versioned.latest(spark, left)
      .join(Versioned.latest(spark, right), "s")
      .groupBy("tier")
      .agg(count(lit(1)).as("cnt"),
        sum(col("x").cast("decimal(18,6)")).cast("double").as("sum_x"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("facts, dim updates, and deletes all refresh to the join recompute") {
    val left = tmp("mvj-l"); val right = tmp("mvj-r"); val view = tmp("mvj-v")
    Versioned.appendCommit(
      Seq((1L, "s1", 1.0), (2L, "s1", 2.0), (3L, "s2", 4.0))
        .toDF("k", "s", "x").coalesce(1), left, bloomCols = Seq("s", "k"))
    Versioned.appendCommit(
      Seq(("s1", 0L), ("s2", 1L), ("s3", 2L)).toDF("s", "tier").coalesce(1),
      right, bloomCols = Seq("s"))
    MaterializedJoinView.create(spark, left, right, view, "s",
      Seq("tier"), Seq("x"))
    assert(rows(view) === recompute(left, right))
    assert(rows(view) === Set((0L, 2L, 3.0), (1L, 1L, 4.0)))

    // fact appends, incl. a source with no dim row yet (joins nothing)
    Versioned.appendCommit(
      Seq((4L, "s2", 8.0), (5L, "s9", 99.0)).toDF("k", "s", "x").coalesce(1),
      left, bloomCols = Seq("s", "k"))
    assert(MaterializedJoinView.refresh(spark, view) >= 0)
    assert(rows(view) === recompute(left, right))

    // dim UPDATE: s1 moves tiers — every joined fact must migrate
    // (A_old ⋈ ΔB with the retract/insert pair)
    Versioned.upsertCommit(Seq(("s1", 5L)).toDF("s", "tier").coalesce(1),
      right, "s")
    MaterializedJoinView.refresh(spark, view)
    assert(rows(view) === recompute(left, right))
    assert(rows(view) === Set((5L, 2L, 3.0), (1L, 2L, 12.0)))

    // BOTH sides move between refreshes: a new fact for a source whose
    // dim row changes in the same span (the ΔA ⋈ ΔB term must cancel
    // the stale pairing exactly)
    Versioned.appendCommit(Seq((6L, "s1", 10.0)).toDF("k", "s", "x").coalesce(1),
      left, bloomCols = Seq("s", "k"))
    Versioned.upsertCommit(Seq(("s1", 7L)).toDF("s", "tier").coalesce(1),
      right, "s")
    MaterializedJoinView.refresh(spark, view)
    assert(rows(view) === recompute(left, right))
    assert(rows(view).exists { case (t, c, s) => t == 7L && c == 3L && s == 13.0 })

    // fact deletes empty a group: its view row disappears
    Versioned.deleteCommit(spark, left, "k", Seq("3", "4"))
    MaterializedJoinView.refresh(spark, view)
    assert(rows(view) === recompute(left, right))
    assert(!rows(view).exists(_._1 == 1L))

    // caught up: -1, no commit
    val h = Versioned.history(view).size
    assert(MaterializedJoinView.refresh(spark, view) === -1L)
    assert(Versioned.history(view).size === h)
  }

  test("WHERE predicate: the filtered view maintains through both sides' deltas") {
    val left = tmp("mvjw-l"); val right = tmp("mvjw-r"); val view = tmp("mvjw-v")
    def recomputeW: Set[(Long, Long, Double)] =
      Versioned.latest(spark, left)
        .join(Versioned.latest(spark, right), "s")
        .filter(col("x") >= 2.0 && col("tier") =!= 9L)
        .groupBy("tier")
        .agg(count(lit(1)).as("cnt"),
          sum(col("x").cast("decimal(18,6)")).cast("double").as("sum_x"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    Versioned.appendCommit(
      Seq((1L, "s1", 1.0), (2L, "s1", 2.0), (3L, "s2", 4.0))
        .toDF("k", "s", "x").coalesce(1), left, bloomCols = Seq("s", "k"))
    Versioned.appendCommit(
      Seq(("s1", 0L), ("s2", 1L)).toDF("s", "tier").coalesce(1),
      right, bloomCols = Seq("s"))
    MaterializedJoinView.create(spark, left, right, view, "s",
      Seq("tier"), Seq("x"), where = "x >= 2.0 AND tier != 9")
    assert(rows(view) === recomputeW)
    assert(rows(view) === Set((0L, 1L, 2.0), (1L, 1L, 4.0)))
    // a sub-threshold fact joins but is filtered out of the view
    Versioned.appendCommit(
      Seq((4L, "s1", 0.5), (5L, "s2", 8.0)).toDF("k", "s", "x").coalesce(1),
      left, bloomCols = Seq("s", "k"))
    MaterializedJoinView.refresh(spark, view)
    assert(rows(view) === recomputeW)
    // a dim move INTO the excluded tier drops the group's facts from the
    // view (the retraction side filters identically)
    Versioned.upsertCommit(Seq(("s2", 9L)).toDF("s", "tier").coalesce(1),
      right, "s")
    MaterializedJoinView.refresh(spark, view)
    assert(rows(view) === recomputeW)
    assert(rows(view) === Set((0L, 1L, 2.0)))
  }

  test("min/max: inserts self-maintain, retractions hit the recompute arm") {
    val left = tmp("mvjm-l"); val right = tmp("mvjm-r"); val view = tmp("mvjm-v")
    def rowsMM: Set[(Long, Long, Double, Double, Double)] =
      MaterializedJoinView.read(spark, view)
        .select(col("tier"), col("cnt"), col("sum_x"), col("min_x"), col("max_x"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4))).toSet
    def recomputeMM: Set[(Long, Long, Double, Double, Double)] =
      Versioned.latest(spark, left)
        .join(Versioned.latest(spark, right), "s")
        .groupBy("tier")
        .agg(count(lit(1)).as("cnt"),
          sum(col("x").cast("decimal(18,6)")).cast("double").as("sum_x"),
          min("x").as("min_x"), max("x").as("max_x"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4))).toSet
    Versioned.appendCommit(
      Seq((1L, "s1", 1.0), (2L, "s1", 7.0), (3L, "s2", 4.0))
        .toDF("k", "s", "x").coalesce(1), left, bloomCols = Seq("s", "k"))
    Versioned.appendCommit(
      Seq(("s1", 0L), ("s2", 1L)).toDF("s", "tier").coalesce(1),
      right, bloomCols = Seq("s"))
    MaterializedJoinView.create(spark, left, right, view, "s",
      Seq("tier"), Seq("x"), minMaxCols = Seq("x"))
    assert(rowsMM === recomputeMM)
    // insert-only span: extremes extend without touching the base
    Versioned.appendCommit(
      Seq((4L, "s1", 9.0), (5L, "s1", 0.5)).toDF("k", "s", "x").coalesce(1),
      left, bloomCols = Seq("s", "k"))
    MaterializedJoinView.refresh(spark, view)
    assert(rowsMM === recomputeMM)
    assert(rowsMM.exists { case (t, _, _, mn, mx) => t == 0L && mn == 0.5 && mx == 9.0 })
    // deleting the max forces the hybrid recompute of exactly that group
    Versioned.deleteCommit(spark, left, "k", Seq("4"))
    MaterializedJoinView.refresh(spark, view)
    assert(rowsMM === recomputeMM)
    assert(rowsMM.exists { case (t, _, _, mn, mx) => t == 0L && mn == 0.5 && mx == 7.0 })
    // a dim move retracts every joined fact from the old group and
    // re-inserts into the new — both arms in one refresh
    Versioned.upsertCommit(Seq(("s2", 0L)).toDF("s", "tier").coalesce(1),
      right, "s")
    MaterializedJoinView.refresh(spark, view)
    assert(rowsMM === recomputeMM)
  }

  test("min/max: a both-source span with phantom evidence still recomputes") {
    // the lemma-unsoundness construction: in ONE span, a group's facts
    // churn cnt- and sum-neutrally ({5,9} → {6,8}) while new facts {3,10}
    // land on a source whose dim row simultaneously leaves the group —
    // the ΔA⋈ΔB term plants 3 and 10 on BOTH evidence sides, so insert
    // and retraction stats match exactly (cnt 0, sum 0, min 3=3,
    // max 10=10) yet the true extremes moved 5/9 → 6/8. The lemma must
    // NOT cancel this group; the recompute arm must fix it.
    val left = tmp("mvjp-l"); val right = tmp("mvjp-r"); val view = tmp("mvjp-v")
    Versioned.appendCommit(
      Seq((1L, "s1", 5.0), (2L, "s1", 9.0)).toDF("k", "s", "x").coalesce(1),
      left, bloomCols = Seq("s", "k"))
    Versioned.appendCommit(
      Seq(("s1", 0L), ("s2", 0L)).toDF("s", "tier").coalesce(1),
      right, bloomCols = Seq("s"))
    MaterializedJoinView.create(spark, left, right, view, "s",
      Seq("tier"), Seq("x"), minMaxCols = Seq("x"))
    Versioned.deleteCommit(spark, left, "k", Seq("1", "2"))
    Versioned.appendCommit(
      Seq((3L, "s1", 6.0), (4L, "s1", 8.0), (5L, "s2", 3.0), (6L, "s2", 10.0))
        .toDF("k", "s", "x").coalesce(1), left, bloomCols = Seq("s", "k"))
    Versioned.upsertCommit(Seq(("s2", 1L)).toDF("s", "tier").coalesce(1),
      right, "s")
    MaterializedJoinView.refresh(spark, view)
    val got = MaterializedJoinView.read(spark, view)
      .select(col("tier"), col("cnt"), col("sum_x"), col("min_x"), col("max_x"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got === Set((0L, 2L, 14.0, 6.0, 8.0), (1L, 2L, 13.0, 3.0, 10.0)))
  }

  test("compact + other-side move in one span: untainted groups keep the lemma") {
    // a compact of the fact side coinciding with a dim move must NOT
    // disable the lemma globally (that would recompute the whole view):
    // only groups the ΔA⋈ΔB correction term actually touched (_t3) lose
    // it. Group 0's compact churn cancels and its view file survives the
    // refresh untouched; groups 1→2 (the dim move) recompute exactly.
    val left = tmp("mvjc-l"); val right = tmp("mvjc-r"); val view = tmp("mvjc-v")
    Versioned.appendCommit(
      Seq((1L, "s1", 5.0), (2L, "s2", 7.0)).toDF("k", "s", "x").coalesce(1),
      left, bloomCols = Seq("s", "k"))
    Versioned.appendCommit(
      Seq(("s1", 0L), ("s2", 1L)).toDF("s", "tier").coalesce(1),
      right, bloomCols = Seq("s"))
    MaterializedJoinView.create(spark, left, right, view, "s",
      Seq("tier"), Seq("x"), minMaxCols = Seq("x"))
    val before = Versioned.manifest(view, Versioned.latestVersion(view))
      .map(_.path).toSet
    // one span: fact-side compact + dim move s2: 1 → 2
    Versioned.compact(spark, left, numFiles = 1)
    Versioned.upsertCommit(Seq(("s2", 2L)).toDF("s", "tier").coalesce(1),
      right, "s")
    MaterializedJoinView.refresh(spark, view)
    val got = MaterializedJoinView.read(spark, view)
      .select(col("tier"), col("cnt"), col("sum_x"), col("min_x"), col("max_x"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got === Set((0L, 1L, 5.0, 5.0, 5.0), (2L, 1L, 7.0, 7.0, 7.0)))
    // the untainted group's pre-refresh data file is still listed — the
    // compact span cancelled under the lemma instead of rewriting it
    val after = Versioned.manifest(view, Versioned.latestVersion(view))
      .map(_.path).toSet
    assert(before.intersect(after).nonEmpty,
      "compact-span group was rewritten despite the lemma")
  }

  test("refresh cleans up its stage landings (stageDir does not grow)") {
    val left = tmp("mvjs2-l"); val right = tmp("mvjs2-r"); val view = tmp("mvjs2-v")
    val stageDir = tmp("mvjs2-stage")
    spark.conf.set("spark.graft.stageDir", stageDir)
    try {
      Versioned.appendCommit(
        Seq((1L, "s1", 1.0)).toDF("k", "s", "x").coalesce(1),
        left, bloomCols = Seq("s", "k"))
      Versioned.appendCommit(
        Seq(("s1", 0L)).toDF("s", "tier").coalesce(1), right, bloomCols = Seq("s"))
      MaterializedJoinView.create(spark, left, right, view, "s",
        Seq("tier"), Seq("x"), minMaxCols = Seq("x"))
      Versioned.appendCommit(
        Seq((2L, "s1", 3.0)).toDF("k", "s", "x").coalesce(1),
        left, bloomCols = Seq("s", "k"))
      Versioned.deleteCommit(spark, left, "k", Seq("1"))
      MaterializedJoinView.refresh(spark, view)
      assert(rows(view) === recompute(left, right))
      // every refresh-scoped stage landing was deleted after the commit
      assert(new java.io.File(stageDir).list().isEmpty,
        "stage landings leaked after refresh")
    } finally spark.conf.unset("spark.graft.stageDir")
  }

  test("second order: a MaterializedView over the join-view root refreshes through") {
    import graft.sources.MaterializedView
    val left = tmp("mvj2-l"); val right = tmp("mvj2-r")
    val view = tmp("mvj2-v"); val roll = tmp("mvj2-roll")
    Versioned.appendCommit(
      Seq((1L, "s1", 1.0), (2L, "s2", 2.0), (3L, "s3", 4.0))
        .toDF("k", "s", "x").coalesce(1), left, bloomCols = Seq("s", "k"))
    Versioned.appendCommit(
      Seq(("s1", 0L), ("s2", 0L), ("s3", 1L)).toDF("s", "tier").coalesce(1),
      right, bloomCols = Seq("s"))
    MaterializedJoinView.create(spark, left, right, view, "s",
      Seq("tier"), Seq("x"))
    // level 2: count of tiers + total joined rows, OVER THE VIEW TABLE —
    // its change feed is replaceCommit lineage (tombstone + append)
    MaterializedView.create(spark, view, roll, Nil, Seq("cnt"))
    def rollRows: Set[(Long, Double)] =
      MaterializedView.read(spark, roll).select(col("cnt"), col("sum_cnt"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(rollRows === Set((2L, 3.0))) // 2 tier groups, 3 joined rows
    // ripple: new fact in a NEW tier + a dim move emptying tier 1
    Versioned.appendCommit(Seq((4L, "s4", 8.0)).toDF("k", "s", "x").coalesce(1),
      left, bloomCols = Seq("s", "k"))
    Versioned.upsertCommit(
      Seq(("s4", 5L), ("s3", 0L)).toDF("s", "tier").coalesce(1), right, "s")
    MaterializedJoinView.refresh(spark, view)
    MaterializedView.refresh(spark, roll)
    assert(rows(view) === recompute(left, right))
    assert(rollRows === Set((2L, 4.0))) // tiers {0, 5}, 4 joined rows
  }

  test("third order: a join view whose LEFT source is another join view") {
    val facts = tmp("mvj3-f"); val dims = tmp("mvj3-d")
    val tiers = tmp("mvj3-t"); val l1 = tmp("mvj3-l1"); val l2 = tmp("mvj3-l2")
    Versioned.appendCommit(
      Seq((1L, "s1", 1.0), (2L, "s2", 2.0), (3L, "s3", 4.0))
        .toDF("k", "s", "x").coalesce(1), facts, bloomCols = Seq("s", "k"))
    Versioned.appendCommit(
      Seq(("s1", 0L), ("s2", 0L), ("s3", 1L)).toDF("s", "tier").coalesce(1),
      dims, bloomCols = Seq("s"))
    // tier metadata joined ABOVE the level-1 aggregate
    Versioned.appendCommit(
      Seq((0L, "basic"), (1L, "premium"), (5L, "vip"))
        .toDF("tier", "plan").coalesce(1), tiers, bloomCols = Seq("tier"))
    MaterializedJoinView.create(spark, facts, dims, l1, "s",
      Seq("tier"), Seq("x"))
    // level 2: per-plan rollup of the level-1 view — its LEFT change feed
    // is the view's own replaceCommit lineage
    MaterializedJoinView.create(spark, l1, tiers, l2, "tier",
      Seq("plan"), Seq("sum_x"))
    def l2rows: Set[(String, Long, Double)] =
      MaterializedJoinView.read(spark, l2)
        .select(col("plan"), col("cnt"), col("sum_sum_x")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // cnt counts level-1 GROUPS per plan; sum_sum_x sums their sums
    assert(l2rows === Set(("basic", 1L, 3.0), ("premium", 1L, 4.0)))
    // ripple: a new fact lands in a NEW tier, a dim move drains tier 1
    Versioned.appendCommit(Seq((4L, "s4", 8.0)).toDF("k", "s", "x").coalesce(1),
      facts, bloomCols = Seq("s", "k"))
    Versioned.upsertCommit(
      Seq(("s4", 5L), ("s3", 0L)).toDF("s", "tier").coalesce(1), dims, "s")
    MaterializedJoinView.refresh(spark, l1)
    MaterializedJoinView.refresh(spark, l2)
    assert(rows(l1) === recompute(facts, dims))
    assert(l2rows === Set(("basic", 1L, 7.0), ("vip", 1L, 8.0)))
    // a fact delete that empties a level-1 group tombstones it at level 2
    Versioned.deleteCommit(spark, facts, "k", Seq("4"))
    MaterializedJoinView.refresh(spark, l1)
    MaterializedJoinView.refresh(spark, l2)
    assert(l2rows === Set(("basic", 1L, 7.0)))
  }

  test("streaming: per-micro-batch fact landing + join-view refresh stays exact") {
    val left = tmp("mvjs-l"); val right = tmp("mvjs-r"); val view = tmp("mvjs-v")
    Versioned.appendCommit(
      Seq((1L, "s1", 1.0)).toDF("k", "s", "x").coalesce(1),
      left, bloomCols = Seq("s", "k"))
    Versioned.appendCommit(
      Seq(("s1", 0L), ("s2", 1L)).toDF("s", "tier").coalesce(1),
      right, bloomCols = Seq("s"))
    MaterializedJoinView.create(spark, left, right, view, "s",
      Seq("tier"), Seq("x"))
    val dir = Files.createTempDirectory("mvj-in").toFile
    val chk = Files.createTempDirectory("mvj-chk").toFile
    Files.write(dir.toPath.resolve("b1.json"),
      """{"k":2,"s":"s1","x":2.5}
        |{"k":3,"s":"s2","x":4.0}""".stripMargin.getBytes)
    val q = spark.readStream
      .schema("k LONG, s STRING, x DOUBLE").json(dir.getAbsolutePath)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          Versioned.appendCommit(batch.coalesce(1), left, bloomCols = Seq("s", "k"))
          MaterializedJoinView.refresh(spark, view)
          ()
        }
      }
      .option("checkpointLocation", chk.getAbsolutePath)
      .start()
    try {
      q.processAllAvailable()
      assert(rows(view) === recompute(left, right))
      Files.write(dir.toPath.resolve("b2.json"),
        """{"k":4,"s":"s2","x":6.0}""".getBytes)
      q.processAllAvailable()
      assert(rows(view) === recompute(left, right))
      assert(rows(view) === Set((0L, 2L, 3.5), (1L, 2L, 10.0)))
      // one fact landing + one view commit per non-empty batch
      assert(Versioned.history(left).length === 3)
      assert(Versioned.history(view).length === 3)
    } finally q.stop()
  }

  test("fuzz: random two-sided op sequences always refresh to the recompute") {
    val rnd = new scala.util.Random(271828L)
    val left = tmp("mvj-l"); val right = tmp("mvj-r"); val view = tmp("mvj-v")
    val sources = Vector("a", "b", "c")
    var nextK = 0L
    var facts = Map.empty[Long, (String, Double)]
    var dims = Map("a" -> 1L, "b" -> 2L)
    def factRows(n: Int): Seq[(Long, String, Double)] =
      (0 until n).map { _ =>
        nextK += 1
        val r = (nextK, sources(rnd.nextInt(sources.size)),
          math.round(rnd.nextDouble() * 1000) / 100.0)
        facts += r._1 -> ((r._2, r._3)); r
      }
    def rowsMM: Set[(Long, Long, Double, Option[Double], Option[Double])] =
      MaterializedJoinView.read(spark, view)
        .select(col("tier"), col("cnt"), col("sum_x"), col("min_x"), col("max_x"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSet
    Versioned.appendCommit(factRows(5).toDF("k", "s", "x").coalesce(1),
      left, bloomCols = Seq("s", "k"))
    Versioned.appendCommit(dims.toSeq.toDF("s", "tier").coalesce(1),
      right, bloomCols = Seq("s"))
    MaterializedJoinView.create(spark, left, right, view, "s",
      Seq("tier"), Seq("x"), minMaxCols = Seq("x"))
    for (step <- 0 until 12) {
      // each step mutates one or both sides before refreshing
      if (rnd.nextBoolean())
        Versioned.appendCommit(factRows(rnd.nextInt(2) + 1)
          .toDF("k", "s", "x").coalesce(1), left, bloomCols = Seq("s", "k"))
      rnd.nextInt(3) match {
        case 0 => // dim upsert (move or add a source)
          val s = sources(rnd.nextInt(sources.size))
          val t = rnd.nextInt(5).toLong
          dims += s -> t
          Versioned.upsertCommit(Seq((s, t)).toDF("s", "tier").coalesce(1),
            right, "s")
        case 1 if facts.nonEmpty => // fact delete
          val k = rnd.shuffle(facts.keys.toSeq).head
          facts -= k
          Versioned.deleteCommit(spark, left, "k", Seq(k.toString))
        case _ => ()
      }
      MaterializedJoinView.refresh(spark, view)
      val model = facts.toSeq
        .flatMap { case (_, (s, x)) => dims.get(s).map(t => (t, x)) }
        .groupBy(_._1)
        .map { case (t, xs) =>
          (t, xs.size.toLong, xs.map(v => BigDecimal(v._2)).sum.toDouble,
            Option(xs.map(_._2).min), Option(xs.map(_._2).max))
        }.toSet
      assert(rowsMM === model, s"step $step")
      assert(rows(view) === recompute(left, right), s"step $step vs recompute")
    }
  }
}
