package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained GROUP BY aggregates over a [[Versioned]]
  * table — the materialized-view shape (Delta Live Tables / Materialize /
  * the IVM literature): the view holds `cnt` + exact decimal `sum_<c>`
  * per group, and [[refresh]] advances it by consuming ONLY the change
  * feed ([[Versioned.changesBetween]]) since the last refresh — O(delta)
  * regardless of table or view size. Count and sum are the self-
  * maintainable aggregates (inserts add, deletes subtract — no history
  * needed); avg derives as sum/cnt at read time. Min/max are NOT
  * self-maintainable under deletes (a retracted max needs the runner-up,
  * which only the base data knows) and are deliberately out of scope.
  *
  * == Correctness levers ==
  *
  *  - **Exact arithmetic**: sums are DECIMAL(28,6) (the engine-wide
  *    order-independent float discipline), so increments commute and a
  *    refreshed view is BIT-IDENTICAL to a full recompute — hash-
  *    comparable, not approximately equal.
  *  - **Atomicity**: each refresh is ONE [[Versioned.replaceCommit]]
  *    carrying the updated groups, the tombstones of groups whose count
  *    reached zero, AND the new source watermark in the marker's
  *    `props` — a crash at any point either applied the whole delta
  *    (watermark advanced) or none of it (watermark unchanged; the next
  *    refresh re-reads the same change span). Double-apply is
  *    structurally impossible.
  *  - **Snapshot boundaries**: across a source [[Versioned.compact]] the
  *    change feed degenerates to delete-all + insert-all; the per-group
  *    deltas cancel EXACTLY (decimal arithmetic) and are filtered out,
  *    so the refresh is a watermark-only metadata commit.
  *
  * == Scale shape ==
  *
  * The refresh reads the change span (delta files only on append/delete
  * lineage), aggregates it map-side into per-group deltas (bounded by
  * |affected groups| ≤ |delta|), bloom-point-reads exactly the view
  * files holding the affected groups, and commits O(affected groups).
  * Nothing is O(table) except crossing a compact boundary's read (which
  * nets out to a metadata commit). Group keys travel to the driver only
  * as the point-read probe list — the same O(delta) contract
  * [[Versioned.applyCdc]] documents; payloads never leave the cluster.
  */
object MaterializedView {

  /** The concatenated group-key column — the view table's upsert key.
    * Unit separator between columns; nulls render distinct from the
    * string "null" via a sentinel.
    */
  private val GK = "_gk"

  private def gkOf(groupCols: Seq[String]): Column =
    concat_ws("\u0001",
      groupCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)

  private def decSum(c: String): Column =
    sum(col(c).cast("decimal(18,6)")).cast("decimal(28,6)").as(s"sum_$c")

  private case class Def(
      sourceRoot: String,
      groupCols: Seq[String],
      sumCols: Seq[String],
      srcVersion: Long)

  private def propsOf(d: Def): Map[String, String] = Map(
    "mv.sourceRoot" -> d.sourceRoot,
    "mv.groupCols" -> d.groupCols.mkString(","),
    "mv.sumCols" -> d.sumCols.mkString(","),
    "mv.sourceVersion" -> d.srcVersion.toString)

  private def defOf(viewRoot: String): Def = {
    val v = Versioned.latestVersion(viewRoot)
    require(v >= 0, s"no committed versions in $viewRoot")
    val p = Versioned.markerProps(viewRoot, v)
    require(p.contains("mv.sourceVersion"),
      s"$viewRoot is not a materialized view (no mv.* props on v$v)")
    Def(p("mv.sourceRoot"), p("mv.groupCols").split(',').toSeq,
      p("mv.sumCols").split(',').toSeq, p("mv.sourceVersion").toLong)
  }

  private def aggregated(
      src: DataFrame, groupCols: Seq[String], sumCols: Seq[String]): DataFrame =
    src.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"), sumCols.map(decSum): _*)
      .withColumn(GK, gkOf(groupCols))

  /** Materialize the view over `sourceRoot`'s LATEST version into a new
    * Versioned table at `viewRoot` (the one O(table) pass; every later
    * [[refresh]] is O(delta)). Returns the view's committed version.
    */
  def create(
      spark: SparkSession,
      sourceRoot: String,
      viewRoot: String,
      groupCols: Seq[String],
      sumCols: Seq[String]): Long = {
    val srcV = Versioned.latestVersion(sourceRoot)
    require(srcV >= 0, s"no committed versions in $sourceRoot")
    Versioned.appendCommit(
      aggregated(Versioned.asOf(spark, sourceRoot, srcV), groupCols, sumCols),
      viewRoot, bloomCols = Seq(GK),
      props = propsOf(Def(sourceRoot, groupCols, sumCols, srcV)))
  }

  /** The view's current contents: group columns, `cnt`, each sum as a
    * double `sum_<c>`, and the derived `avg_<c>`.
    */
  def read(spark: SparkSession, viewRoot: String): DataFrame = {
    val d = defOf(viewRoot)
    val base = Versioned.latest(spark, viewRoot).drop(GK)
    d.sumCols.foldLeft(base) { (df, c) =>
      df.withColumn(s"avg_$c",
        (col(s"sum_$c") / col("cnt")).cast("double"))
        .withColumn(s"sum_$c", col(s"sum_$c").cast("double"))
    }
  }

  /** Advance the view to the source's latest version by consuming the
    * change feed since the recorded watermark — ONE atomic commit (or
    * nothing, when the source hasn't moved). Returns the view's new
    * version, or -1 if the source was already caught up.
    */
  def refresh(spark: SparkSession, viewRoot: String): Long = {
    val d = defOf(viewRoot)
    val vNow = Versioned.latestVersion(d.sourceRoot)
    require(vNow >= d.srcVersion,
      s"source ${d.sourceRoot} went backwards ($vNow < ${d.srcVersion})")
    if (vNow == d.srcVersion) return -1L
    val newProps = propsOf(d.copy(srcVersion = vNow))
    val cdf = Versioned.changesBetween(spark, d.sourceRoot, d.srcVersion, vNow)
    val sign = when(col("_change_type") === "insert", lit(1)).otherwise(lit(-1))
    val zero = lit(0).cast("decimal(28,6)")
    val delta = cdf.groupBy(d.groupCols.map(col): _*)
      .agg(
        sum(sign).cast("bigint").as("_dcnt"),
        d.sumCols.map(c =>
          sum(sign * col(c).cast("decimal(18,6)"))
            .cast("decimal(28,6)").as(s"_dsum_$c")): _*)
      // compact-boundary cancellation: a group whose delta nets to zero
      // everywhere (exact decimals) needs no touch at all
      .filter(d.sumCols.map(c => col(s"_dsum_$c") =!= zero)
        .foldLeft(col("_dcnt") =!= 0L)(_ || _))
      .withColumn(GK, gkOf(d.groupCols))
      .localCheckpoint()
    val keys = delta.select(col(GK)).collect().map(_.getString(0)).toSeq.sorted
    if (keys.isEmpty)
      // watermark-only metadata commit (e.g. the span was a compact)
      return Versioned.replaceCommit(
        Versioned.latest(spark, viewRoot).filter(lit(false)),
        viewRoot, GK, props = newProps)
    val old = Versioned.pointRead(
      spark, viewRoot, Versioned.latestVersion(viewRoot), GK, keys)
    val merged = delta.alias("d")
      .join(old.alias("o"), Seq(GK), "left")
      .select(
        Seq(col(GK),
          (coalesce(col("o.cnt"), lit(0L)) + col("d._dcnt")).as("cnt")) ++
        d.groupCols.map(c => col(s"d.$c")) ++
        d.sumCols.map(c =>
          (coalesce(col(s"o.sum_$c"), zero) + col(s"d._dsum_$c"))
            .cast("decimal(28,6)").as(s"sum_$c")): _*)
      .withColumn("cnt",
        when(col("cnt") < 0L,
          raise_error(concat(lit("materialized view underflow on group "),
            col(GK))).cast("bigint"))
          .otherwise(col("cnt")))
      .localCheckpoint()
    val survivors = merged.filter(col("cnt") > 0L)
      .select((d.groupCols.map(col) :+ col("cnt")) ++
        d.sumCols.map(c => col(s"sum_$c")) :+ col(GK): _*)
    val zeroed = merged.filter(col("cnt") === 0L)
      .select(col(GK)).collect().map(_.getString(0)).toSeq.sorted
    Versioned.replaceCommit(
      survivors, viewRoot, GK, deleteKeys = zeroed, props = newProps)
  }
}
