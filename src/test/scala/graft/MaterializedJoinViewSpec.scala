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
    Versioned.appendCommit(factRows(5).toDF("k", "s", "x").coalesce(1),
      left, bloomCols = Seq("s", "k"))
    Versioned.appendCommit(dims.toSeq.toDF("s", "tier").coalesce(1),
      right, bloomCols = Seq("s"))
    MaterializedJoinView.create(spark, left, right, view, "s",
      Seq("tier"), Seq("x"))
    for (step <- 0 until 10) {
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
          (t, xs.size.toLong, xs.map(v => BigDecimal(v._2)).sum.toDouble)
        }.toSet
      assert(rows(view) === model, s"step $step")
      assert(rows(view) === recompute(left, right), s"step $step vs recompute")
    }
  }
}
