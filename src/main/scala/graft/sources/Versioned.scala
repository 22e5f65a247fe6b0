package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal versioned-table layer over immutable parquet — the commit /
  * time-travel semantics a lakehouse table format provides (this container
  * has no Delta/Iceberg; the protocol is what matters), built from the
  * primitives the engine already has:
  *
  *   - every commit writes a NEW immutable data directory under a
  *     UNIQUE staging name, then a tiny commit marker under `_commits/`
  *     that references it; the marker write comes AFTER the data so a
  *     crashed writer leaves an orphan staging directory, never a
  *     readable-but-partial version (parquet's `_SUCCESS` discipline
  *     lifted to table level — readers resolve versions AND data paths
  *     from markers only, so uncommitted data is invisible,
  *     spec-asserted). Because staging names never repeat, an orphan can
  *     never collide with a later commit's data write — the marker's
  *     `CREATE_NEW` is the SOLE contention point;
  *   - `asOf(v)` is time travel, `latest` resolves the highest marker;
  *   - versions are monotonic; concurrent committers conflict on the
  *     marker file name (first writer wins), which is the same
  *     optimistic-concurrency primitive the real formats use.
  *
  * Each version here is a full snapshot (the CDC merges that feed it are
  * full-table rewrites at this scale); a production variant stores
  * file-level manifests so unchanged files are SHARED between versions —
  * the reader API and commit protocol are unchanged by that swap, which
  * is why the protocol, not the copy, is what the specs pin. Manifest and
  * marker I/O is driver-side but registry-sized (one tiny file per
  * commit); the data path stays fully distributed.
  */
object Versioned {

  private def commitsDir(root: String) = new java.io.File(root, "_commits")

  private def markerFile(root: String, v: Long) =
    new java.io.File(commitsDir(root), s"v$v.json")

  /** Data directory a committed marker references (markers are the only
    * source of truth for data paths — staging names are not guessable).
    */
  def dataPath(root: String, v: Long): String = {
    val content = new String(
      java.nio.file.Files.readAllBytes(markerFile(root, v).toPath), "UTF-8")
    val m = """"data"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(content)
    require(m.isDefined, s"marker for version $v in $root has no data path")
    s"$root/${m.get.group(1)}"
  }

  /** Highest committed version, or -1 for an empty table. Orphan data
    * directories without a marker do not count.
    */
  def latestVersion(root: String): Long = {
    val dir = commitsDir(root)
    val markers = Option(dir.listFiles()).getOrElse(Array.empty)
    markers.iterator
      .map(_.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripSuffix(".json").stripPrefix("v").toLong
      }
      .foldLeft(-1L)(math.max)
  }

  /** Write `df` as the next version and publish its commit marker.
    * The data lands under a unique staging name BEFORE the version
    * number is claimed, so a crash (or a lost marker race) leaves an
    * orphan that no future commit can ever collide with; the
    * `CREATE_NEW` marker write is the single atomic point of contention.
    * Returns the committed version number.
    */
  def commit(df: DataFrame, root: String): Long = {
    val staging = s"d-${java.util.UUID.randomUUID().toString.take(12)}"
    df.write.mode("errorifexists").parquet(s"$root/$staging")
    val next = latestVersion(root) + 1
    commitsDir(root).mkdirs()
    java.nio.file.Files.write(
      markerFile(root, next).toPath,
      s"""{"version":$next,"data":"$staging"}""".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW)
    next
  }

  /** Time travel: the table exactly as committed at version `v`. */
  def asOf(spark: SparkSession, root: String, v: Long): DataFrame = {
    require(
      markerFile(root, v).exists(),
      s"version $v is not committed in $root")
    spark.read.parquet(dataPath(root, v))
  }

  /** The latest committed snapshot. */
  def latest(spark: SparkSession, root: String): DataFrame = {
    val v = latestVersion(root)
    require(v >= 0, s"no committed versions in $root")
    asOf(spark, root, v)
  }

  /** The full CDC loop: MERGE a changeset into the latest snapshot and
    * commit the result as the next version (see
    * [[graft.operators.Curate.mergeUpsert]] for the merge semantics and
    * its zero-shuffle scale shape). Returns the new version.
    */
  def mergeCommit(
      spark: SparkSession,
      root: String,
      changes: DataFrame,
      keyCol: String): Long =
    commit(graft.operators.Curate.mergeUpsert(latest(spark, root), changes, keyCol), root)

  /** Small-file compaction as a COMMIT: rewrite the latest snapshot into
    * `numFiles` files — z-ordered by `zorderCols` when given (the
    * OPTIMIZE ... ZORDER BY shape), plainly coalesced otherwise — and
    * publish it as the next version. Rows are untouched; only layout
    * changes, and time travel still reads every pre-compaction version.
    * Crash-safety is inherited from [[commit]] (data before marker), and
    * the streaming-ingest small-file problem this solves is exactly why
    * the real formats bundle OPTIMIZE with the table layer: readers always
    * see either the fragmented or the compacted snapshot, never a mix.
    * Returns the new version.
    */
  def compact(
      spark: SparkSession,
      root: String,
      numFiles: Int = 1,
      zorderCols: Seq[String] = Nil): Long = {
    val snap = latest(spark, root)
    val laid =
      if (zorderCols.nonEmpty)
        graft.operators.Layout.zorderBy(snap, zorderCols, numFiles)
      else snap.coalesce(numFiles)
    commit(laid, root)
  }

  /** All committed versions, ascending — the table's readable history. */
  def history(root: String): Seq[Long] = {
    val markers = Option(commitsDir(root).listFiles()).getOrElse(Array.empty)
    markers.iterator
      .map(_.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripSuffix(".json").stripPrefix("v").toLong
      }
      .toSeq.sorted
  }

  /** Retention vacuum: physically drop every committed version older than
    * the latest `keepLast`, marker AND data. The marker is deleted FIRST —
    * the crash-safe inverse of [[commit]]'s data-then-marker order, so an
    * interrupted vacuum leaves an invisible orphan data directory, never a
    * marker pointing at half-deleted data. Orphan directories from OTHER
    * writers are deliberately untouched: an orphan may be a concurrent
    * commit mid-write, and the real formats gate that sweep on a retention
    * age this layer doesn't need. Returns the dropped versions.
    */
  def vacuum(root: String, keepLast: Int = 2): Seq[Long] = {
    require(keepLast >= 1, "must keep at least the latest version")
    val dropped = history(root).dropRight(keepLast)
    dropped.foreach { v =>
      // resolve the data path from the marker BEFORE dropping the marker
      val data = new java.io.File(dataPath(root, v))
      java.nio.file.Files.deleteIfExists(markerFile(root, v).toPath)
      if (data.exists()) {
        import java.nio.file.{Files => F, Path}
        import java.util.Comparator
        F.walk(data.toPath)
          .sorted(Comparator.reverseOrder[Path]())
          .forEach(p => F.deleteIfExists(p))
      }
    }
    dropped
  }
}
