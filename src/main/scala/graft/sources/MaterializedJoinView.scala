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

  private val GK = Ivm.GK

  private def gkOf(groupCols: Seq[String]): Column = Ivm.gkOf(groupCols)

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
    Ivm.viewCols(d.groupCols, d.sumCols, d.minMaxCols)

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
    Ivm.readWithAvg(Versioned.latest(spark, viewRoot).drop(GK), d.sumCols)
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
    // optimistic-concurrency read-set version (see MaterializedView)
    val viewV = Versioned.latestVersion(viewRoot)
    val lv = Versioned.latestVersion(d.leftRoot)
    val rv = Versioned.latestVersion(d.rightRoot)
    require(lv >= d.leftVersion && rv >= d.rightVersion,
      s"a source of $viewRoot went backwards")
    if (lv == d.leftVersion && rv == d.rightVersion) return -1L
    val newProps = propsOf(d.copy(leftVersion = lv, rightVersion = rv))
    // refresh-scoped stage landings: durable while this refresh runs,
    // deleted once its commit has published (or the refresh failed) — a
    // refresh LOOP must not grow the stage volume without bound
    val stage = new Ivm.Stages
    try {
    val dl = signedDelta(spark, d.leftRoot, d.leftVersion, lv)
    val dr = signedDelta(spark, d.rightRoot, d.rightVersion, rv)
    // the three delta-join terms, each sign-weighted and WHERE-filtered.
    // The two probe-key collects are independent (one per source delta) —
    // submitted concurrently so neither waits on the other's tail
    // (guide §2.6)
    val (rOldOpt, lOldOpt) = Ivm.inParallel(
      prunedOld(spark, d.rightRoot, d.rightVersion, d.joinCol, dl),
      prunedOld(spark, d.leftRoot, d.leftVersion, d.joinCol, dr))
    val parts = Seq.newBuilder[DataFrame]
    rOldOpt.foreach { rOld =>
      parts += filtered(dl.get.join(rOld, d.joinCol), d)
        .withColumn("_w", col("_sgn")).withColumn("_t3", lit(0))
    }
    lOldOpt.foreach { lOld =>
      parts += filtered(lOld.join(dr.get, d.joinCol), d)
        .withColumn("_w", col("_sgn")).withColumn("_t3", lit(0))
    }
    (dl, dr) match {
      case (Some(l), Some(r)) =>
        // the correction term is TAGGED: its rows are the only source of
        // phantom extremum evidence (see the lemma note below)
        parts += filtered(
            l.withColumnRenamed("_sgn", "_sl")
              .join(r.withColumnRenamed("_sgn", "_sr"), d.joinCol), d)
          .withColumn("_w", col("_sl") * col("_sr")).withColumn("_t3", lit(1))
      case _ => ()
    }
    val all = parts.result()
    val delta =
      if (all.isEmpty) None
      else Some(stage.applyWithRoot(
        // signed evidence + the no-touch lemma — the shared [[Ivm]]
        // core, with the join-specific hooks: the ΔA⋈ΔB taint flag
        // aggregates alongside, and a tainted group is NEVER
        // lemma-cancelled. SOUNDNESS BOUNDARY: the lemma's premise
        // (retractions are rows the group actually held) holds for every
        // row of the two single-source terms, but the correction term
        // can plant identical phantom values on BOTH extremum-evidence
        // sides of a group (a new fact whose dim row simultaneously
        // leaves the group appears as +x and −x), masking cnt- and
        // sum-neutral extremum churn — so with min/max maintained, a
        // _t3-touched group stays in the delta and its retractions route
        // to the recompute arm. Groups the correction term never reached
        // (all of them in any single-source span — e.g. a compact of one
        // source beside an append on the other) keep the full lemma, so
        // compact spans stay watermark-only. cnt/sum cancellation is
        // exact under any span (linear — phantoms cancel).
        Ivm.evidenceAgg(
            all.map(_.select(
              (d.groupCols.map(col) :+ col("_w") :+ col("_t3")) ++
                (d.sumCols ++ d.minMaxCols).distinct.map(col): _*))
              .reduce(_.unionByName(_)),
            col("_w"), d.groupCols, d.sumCols, d.minMaxCols,
            extraAggs = Seq(max(col("_t3")).as("_t3")))
          .filter(Ivm.lemmaKeep(d.sumCols, d.minMaxCols,
            extraKeep =
              if (d.minMaxCols.isEmpty) None else Some(col("_t3") === 1)))
          .withColumn(GK, gkOf(d.groupCols))))
    // both driver-held key lists (point-read probe set + recompute probe
    // set) read from the STAGED delta's landed files — see
    // MaterializedView.refresh / Ivm.deltaKeyFlags
    val kd = delta.map { case (df, root) => Ivm.deltaKeyFlags(df, root) }
      .getOrElse(Nil)
    val keys = kd.map(_._1).sorted
    if (keys.isEmpty)
      // watermark-only metadata commit
      return Versioned.replaceCommit(
        Versioned.latest(spark, viewRoot).filter(lit(false)),
        viewRoot, GK, props = newProps, expectedVersion = viewV,
        knownKeys = Some(Nil))
    val old = Versioned.pointRead(spark, viewRoot, viewV, GK, keys)
    // groups a retraction touched (and that failed the lemma) lose their
    // extremum evidence — recompute exactly those from the source join
    val recomputeKeys =
      if (d.minMaxCols.isEmpty) Nil
      else kd.filter(_._2 == 1).map(_._1).sorted
    val incrKeys =
      if (d.minMaxCols.isEmpty) keys
      else kd.filter(_._2 == 0).map(_._1)
    val incr = Ivm.mergeIncr(
      delta.get._1.filter(col("_del") === 0 || lit(d.minMaxCols.isEmpty)),
      old, d.groupCols, d.sumCols, d.minMaxCols, "join view")
    // The recompute arm's authority is the source join restricted to the
    // affected groups. The group-key filter is on a derived concat
    // column, so it cannot prune at the scans by itself — decompose the
    // keys into PER-COLUMN value sets and pre-filter each side on the
    // group columns it carries (a superset of the exact key set —
    // cartesian across columns — so the final GK filter stays): with the
    // usual star shape (group columns on the dimension side) the dim
    // scan prunes to the affected groups' rows via pushed In-filters and
    // the join shrinks accordingly; a fact-side group column prunes the
    // fact scan the same way. recomputeKeys is bounded by
    // retraction-touched groups (delta-bounded under the _t3 taint — a
    // single-source compact never lands here), the established
    // driver-held O(delta) contract.
    // the two arms are independent stage landings — submitted concurrently
    // (guide §2.6); outcome identical to the sequential order
    val ((merged, mergedRoot), recomputed) = Ivm.inParallel(
      stage.applyWithRoot(incr),
      if (recomputeKeys.isEmpty) None
      else {
        val perCol = d.groupCols.zipWithIndex.map { case (c, i) =>
          val vals = recomputeKeys.map(_.split("\u0001", -1)(i)).distinct
          val nonNull = vals.filterNot(_ == "\u0000")
          val pred =
            if (nonNull.isEmpty) col(c).isNull
            else if (nonNull.size == vals.size)
              col(c).cast("string").isin(nonNull: _*)
            else col(c).cast("string").isin(nonNull: _*) || col(c).isNull
          c -> pred
        }
        def pruned(df: DataFrame): DataFrame =
          perCol.foldLeft(df) { case (acc, (c, pred)) =>
            if (acc.columns.contains(c)) acc.filter(pred) else acc
          }
        Some(stage.applyWithRoot(
          aggregated(
            filtered(
              pruned(Versioned.asOf(spark, d.leftRoot, lv))
                .join(pruned(Versioned.asOf(spark, d.rightRoot, rv)),
                  d.joinCol), d), d)
            .filter(col(GK).isin(recomputeKeys: _*))))
      })
    val (survivors, zeroed, survivorKeys) =
      Ivm.survivorsAndZeroed(merged, mergedRoot, recomputed, recomputeKeys,
        viewCols(d), incrKeys)
    Versioned.replaceCommit(
      survivors, viewRoot, GK, deleteKeys = zeroed.sorted, props = newProps,
      expectedVersion = viewV, knownKeys = Some(survivorKeys))
    } finally stage.dropAll()
  }
}
