package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained GROUP BY aggregates over an EQUI-JOIN of two
  * [[Versioned]] tables — the join-view half of IVM next to
  * [[MaterializedView]]'s single-table form. The delta identity is the
  * classic one: with signed change feeds (insert = +1, delete = −1),
  *
  *   Δ(A ⋈ B)  =  ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB
  *
  * where the OLD images come from time travel ([[Versioned.asOf]] at the
  * recorded watermarks — the storage layer's versioning is what makes
  * join maintenance expressible at all), and each old side is read
  * through its per-file BLOOM indexes probed with the OTHER side's delta
  * join keys ([[Versioned.pointRead]]) — at 100 TB a delta of k rows
  * consults the handful of files that might join with it, never the
  * table. Counts and DECIMAL(28,6) sums make the signed aggregation
  * exact, so a refreshed view is BIT-IDENTICAL to a recompute; each
  * refresh is ONE [[Versioned.replaceCommit]] carrying both watermarks
  * in the marker `props` (crash-atomic, double-apply impossible — the
  * [[MaterializedView]] discipline).
  *
  * Feature parity with the single-table view:
  *
  *   - an optional WHERE predicate over the JOINED relation (selection
  *     commutes with Δ, so each delta term filters identically);
  *   - optional `min_<c>`/`max_<c>` via the HYBRID strategy — inserts
  *     self-maintain the extremes, a group any retraction touched is
  *     recomputed from the source join (O(affected groups), with the
  *     same no-touch lemma that makes a compact span a watermark-only
  *     commit);
  *   - intermediate deltas land through
  *     [[graft.Tables.materializeStage]] — a DURABLE Versioned stage,
  *     not a `localCheckpoint`, so executor loss mid-refresh re-reads
  *     landed files instead of dying on lost lineage-truncated blocks.
  *
  * Scope: one join column (same name both sides; the bloom-probe list
  * is driver-held and O(delta), the applyCdc contract) and remaining
  * column names disjoint across the two tables. Second-order
  * composition works because the view root IS a Versioned table: a
  * [[MaterializedView]] created over a join-view root consumes its
  * replaceCommit change feed like any other source.
  */
object MaterializedJoinView {

  private val GK = "_gk"

  private def gkOf(groupCols: Seq[String]): Column =
    concat_ws("\u0001",
      groupCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)

  private case class Def(
      leftRoot: String,
      rightRoot: String,
      joinCol: String,
      groupCols: Seq[String],
      sumCols: Seq[String],
      minMaxCols: Seq[String],
      where: String,
      leftVersion: Long,
      rightVersion: Long)

  private def propsOf(d: Def): Map[String, String] = Map(
    "mvj.leftRoot" -> d.leftRoot,
    "mvj.rightRoot" -> d.rightRoot,
    "mvj.joinCol" -> d.joinCol,
    "mvj.groupCols" -> d.groupCols.mkString(","),
    "mvj.sumCols" -> d.sumCols.mkString(","),
    "mvj.minMaxCols" -> d.minMaxCols.mkString(","),
    "mvj.where" -> d.where,
    "mvj.leftVersion" -> d.leftVersion.toString,
    "mvj.rightVersion" -> d.rightVersion.toString)

  private def defOf(viewRoot: String): Def = {
    val v = Versioned.latestVersion(viewRoot)
    require(v >= 0, s"no committed versions in $viewRoot")
    val p = Versioned.markerProps(viewRoot, v)
    require(p.contains("mvj.leftVersion"),
      s"$viewRoot is not a materialized join view (no mvj.* props on v$v)")
    def cols(k: String): Seq[String] =
      p.getOrElse(k, "").split(',').toSeq.filter(_.nonEmpty)
    Def(p("mvj.leftRoot"), p("mvj.rightRoot"), p("mvj.joinCol"),
      cols("mvj.groupCols"), cols("mvj.sumCols"), cols("mvj.minMaxCols"),
      p.getOrElse("mvj.where", ""),
      p("mvj.leftVersion").toLong, p("mvj.rightVersion").toLong)
  }

  /** The view's WHERE predicate over the joined relation — a
    * deterministic row function, so it filters a change-feed term
    * identically whether the row arrives signed +1 or −1 (selection
    * pushes through Δ, the standard IVM rule).
    */
  private def filtered(joined: DataFrame, d: Def): DataFrame =
    if (d.where.isEmpty) joined else joined.filter(expr(d.where))

  /** The full join at explicit versions — create's one O(|A ⋈ B|) pass,
    * and the recompute arm's per-group authority.
    */
  private def joinedAt(
      spark: SparkSession, d: Def, lv: Long, rv: Long): DataFrame =
    filtered(
      Versioned.asOf(spark, d.leftRoot, lv)
        .join(Versioned.asOf(spark, d.rightRoot, rv), d.joinCol), d)

  private def aggregated(joined: DataFrame, d: Def): DataFrame =
    joined.groupBy(d.groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("cnt"),
        d.sumCols.map(c =>
          sum(col(c).cast("decimal(18,6)")).cast("decimal(28,6)")
            .as(s"sum_$c")) ++
          d.minMaxCols.flatMap(c => Seq(
            min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))): _*)
      .withColumn(GK, gkOf(d.groupCols))

  private def viewCols(d: Def): Seq[Column] =
    (d.groupCols.map(col) :+ col("cnt")) ++
      d.sumCols.map(c => col(s"sum_$c")) ++
      d.minMaxCols.flatMap(c => Seq(col(s"min_$c"), col(s"max_$c"))) :+ col(GK)

  /** Materialize the join view over both tables' LATEST versions (the
    * one O(|A ⋈ B|) pass; every later [[refresh]] is delta-bounded).
    */
  def create(
      spark: SparkSession,
      leftRoot: String,
      rightRoot: String,
      viewRoot: String,
      joinCol: String,
      groupCols: Seq[String],
      sumCols: Seq[String],
      minMaxCols: Seq[String] = Nil,
      where: String = ""): Long = {
    val lv = Versioned.latestVersion(leftRoot)
    val rv = Versioned.latestVersion(rightRoot)
    require(lv >= 0 && rv >= 0, "both sources need a committed version")
    val d = Def(leftRoot, rightRoot, joinCol, groupCols, sumCols, minMaxCols,
      where, lv, rv)
    Versioned.appendCommit(aggregated(joinedAt(spark, d, lv, rv), d), viewRoot,
      bloomCols = Seq(GK), props = propsOf(d))
  }

  /** The view's current contents: group columns, `cnt`, each sum as a
    * double `sum_<c>` with the derived `avg_<c>`, and any maintained
    * `min_<c>`/`max_<c>` in their source types.
    */
  def read(spark: SparkSession, viewRoot: String): DataFrame = {
    val d = defOf(viewRoot)
    d.sumCols.foldLeft(Versioned.latest(spark, viewRoot).drop(GK)) { (df, c) =>
      df.withColumn(s"avg_$c", (col(s"sum_$c") / col("cnt")).cast("double"))
        .withColumn(s"sum_$c", col(s"sum_$c").cast("double"))
    }
  }

  /** Signed change feed of `root` between versions: the rows plus a
    * `_sgn` column (+1 insert, −1 delete); None when the span is empty.
    * Deliberately NOT landed: the CDF plan reads only immutable
    * content-addressed delta files resolved from pinned manifests, so
    * each of its few consumers (the join terms, the probe-key collect)
    * re-reads the same bytes deterministically — the durability a stage
    * landing exists to provide is inherent here, and landing would add
    * an O(delta) write per source per refresh for nothing. The AGGREGATED
    * delta (consumed by the key collect, the incremental arm, and the
    * recompute filter — and expensive to re-derive) is what lands.
    */
  private def signedDelta(
      spark: SparkSession, root: String, fromV: Long, toV: Long): Option[DataFrame] =
    if (toV == fromV) None
    else Some(
      Versioned.changesBetween(spark, root, fromV, toV)
        .withColumn("_sgn",
          when(col("_change_type") === "insert", lit(1)).otherwise(lit(-1)))
        .drop("_change_type"))

  /** The other table's OLD image restricted to the delta's join keys —
    * a bloom-pruned point read, never a table scan. None when the delta
    * (and hence the probe list) is empty.
    */
  private def prunedOld(
      spark: SparkSession,
      root: String,
      v: Long,
      joinCol: String,
      delta: Option[DataFrame]): Option[DataFrame] =
    delta.flatMap { d =>
      val keys = d.select(col(joinCol).cast("string")).distinct()
        .collect().map(_.getString(0)).toSeq.sorted
      if (keys.isEmpty) None
      else Some(Versioned.pointRead(spark, root, v, joinCol, keys))
    }

  /** Advance the view to both sources' latest versions — ONE atomic
    * commit (or -1 when both are caught up).
    */
  def refresh(spark: SparkSession, viewRoot: String): Long = {
    val d = defOf(viewRoot)
    val lv = Versioned.latestVersion(d.leftRoot)
    val rv = Versioned.latestVersion(d.rightRoot)
    require(lv >= d.leftVersion && rv >= d.rightVersion,
      s"a source of $viewRoot went backwards")
    if (lv == d.leftVersion && rv == d.rightVersion) return -1L
    val newProps = propsOf(d.copy(leftVersion = lv, rightVersion = rv))
    val dl = signedDelta(spark, d.leftRoot, d.leftVersion, lv)
    val dr = signedDelta(spark, d.rightRoot, d.rightVersion, rv)
    // the three delta-join terms, each sign-weighted and WHERE-filtered
    val parts = Seq.newBuilder[DataFrame]
    prunedOld(spark, d.rightRoot, d.rightVersion, d.joinCol, dl).foreach { rOld =>
      parts += filtered(dl.get.join(rOld, d.joinCol), d)
        .withColumn("_w", col("_sgn"))
    }
    prunedOld(spark, d.leftRoot, d.leftVersion, d.joinCol, dr).foreach { lOld =>
      parts += filtered(lOld.join(dr.get, d.joinCol), d)
        .withColumn("_w", col("_sgn"))
    }
    (dl, dr) match {
      case (Some(l), Some(r)) =>
        parts += filtered(
            l.withColumnRenamed("_sgn", "_sl")
              .join(r.withColumnRenamed("_sgn", "_sr"), d.joinCol), d)
          .withColumn("_w", col("_sl") * col("_sr"))
      case _ => ()
    }
    val zero = lit(0).cast("decimal(28,6)")
    val all = parts.result()
    val isIns = col("_w") > 0
    val delta =
      if (all.isEmpty) None
      else Some(graft.Tables.materializeStage(all.map(_.select(
          (d.groupCols.map(col) :+ col("_w")) ++
            (d.sumCols ++ d.minMaxCols).distinct.map(col): _*))
        .reduce(_.unionByName(_))
        .groupBy(d.groupCols.map(col): _*)
        .agg(
          sum(col("_w")).cast("bigint").as("_dcnt"),
          d.sumCols.map(c =>
            sum(col("_w") * col(c).cast("decimal(18,6)"))
              .cast("decimal(28,6)").as(s"_dsum_$c")) ++
            Seq(max(when(!isIns, lit(1)).otherwise(lit(0))).as("_del")) ++
            d.minMaxCols.flatMap(c => Seq(
              min(when(isIns, col(c))).as(s"_imin_$c"),
              max(when(isIns, col(c))).as(s"_imax_$c"),
              min(when(!isIns, col(c))).as(s"_rmin_$c"),
              max(when(!isIns, col(c))).as(s"_rmax_$c"))): _*)
        // the no-touch lemma (see [[MaterializedView]]): a group whose
        // insert-side stats equal its retraction-side stats provably
        // keeps its exact view row — a compact span on either source
        // becomes a watermark-only commit even with min/max maintained.
        // SOUNDNESS BOUNDARY (round 11): the lemma's premise is that
        // retractions are rows the group actually held, which holds for
        // any SINGLE-source span (each signed row is a genuine join row
        // against the other side's old image) but fails when BOTH
        // sources move in one span — the ΔA⋈ΔB correction term plants
        // identical phantom values on BOTH extremum-evidence sides of a
        // group (e.g. a new fact whose dim row simultaneously leaves the
        // group appears as +x and −x), which can mask genuine extremum
        // churn that is cnt- and sum-neutral. In that case, with min/max
        // maintained, every touched group stays in the delta:
        // retraction-touched groups route to the honest recompute arm,
        // insert-only groups still self-maintain. The cnt/sum clauses
        // stay exact under any span (they are linear — phantoms cancel).
        .filter(
          if (d.minMaxCols.nonEmpty && dl.nonEmpty && dr.nonEmpty) lit(true)
          else
            (d.sumCols.map(c => col(s"_dsum_$c") =!= zero) ++
              d.minMaxCols.flatMap(c => Seq(
                !(col(s"_imin_$c") <=> col(s"_rmin_$c")),
                !(col(s"_imax_$c") <=> col(s"_rmax_$c")))))
              .foldLeft(col("_dcnt") =!= 0L)(_ || _))
        .withColumn(GK, gkOf(d.groupCols))))
    val keys = delta.map(_.select(col(GK)).collect().map(_.getString(0)).toSeq.sorted)
      .getOrElse(Nil)
    if (keys.isEmpty)
      // watermark-only metadata commit
      return Versioned.replaceCommit(
        Versioned.latest(spark, viewRoot).filter(lit(false)),
        viewRoot, GK, props = newProps)
    val old = Versioned.pointRead(
      spark, viewRoot, Versioned.latestVersion(viewRoot), GK, keys)
    // groups a retraction touched (and that failed the lemma) lose their
    // extremum evidence — recompute exactly those from the source join
    val recomputeKeys =
      if (d.minMaxCols.isEmpty) Nil
      else delta.get.filter(col("_del") === 1)
        .select(col(GK)).collect().map(_.getString(0)).toSeq.sorted
    val incr = delta.get.filter(col("_del") === 0 || lit(d.minMaxCols.isEmpty))
      .alias("d")
      .join(old.alias("o"), Seq(GK), "left")
      .select(
        Seq(col(GK),
          (coalesce(col("o.cnt"), lit(0L)) + col("d._dcnt")).as("cnt")) ++
        d.groupCols.map(c => col(s"d.$c")) ++
        d.sumCols.map(c =>
          (coalesce(col(s"o.sum_$c"), zero) + col(s"d._dsum_$c"))
            .cast("decimal(28,6)").as(s"sum_$c")) ++
        // insert-only groups self-maintain the extremes
        d.minMaxCols.flatMap(c => Seq(
          least(col(s"o.min_$c"), col(s"d._imin_$c")).as(s"min_$c"),
          greatest(col(s"o.max_$c"), col(s"d._imax_$c")).as(s"max_$c"))): _*)
      .withColumn("cnt",
        when(col("cnt") < 0L,
          raise_error(concat(lit("join view underflow on group "),
            col(GK))).cast("bigint"))
          .otherwise(col("cnt")))
    val merged = graft.Tables.materializeStage(incr)
    val recomputed =
      if (recomputeKeys.isEmpty) None
      else Some(graft.Tables.materializeStage(
        aggregated(joinedAt(spark, d, lv, rv), d)
          .filter(col(GK).isin(recomputeKeys: _*))))
    val survivors = (merged.filter(col("cnt") > 0L).select(viewCols(d): _*) +:
      recomputed.map(_.select(viewCols(d): _*)).toSeq).reduce(_.unionByName(_))
    // zero-count incremental groups vanish; so do recompute-arm groups
    // whose joined rows are all gone
    val zeroed = merged.filter(col("cnt") === 0L)
      .select(col(GK)).collect().map(_.getString(0)).toSeq ++
      recomputed.map { r =>
        val alive = r.select(col(GK)).collect().map(_.getString(0)).toSet
        recomputeKeys.filterNot(alive)
      }.getOrElse(Nil)
    Versioned.replaceCommit(
      survivors, viewRoot, GK, deleteKeys = zeroed.sorted, props = newProps)
  }
}
