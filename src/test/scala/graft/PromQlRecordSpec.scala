package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Firehose
import graft.promql.{PromQlCompileException, PromQlRecord, PromQlRules}
import graft.sources.Versioned

/** Incremental recording rules ([[PromQlRecord]]): a rule maintained as a
  * materialized view over a landed Versioned metric table must equal the
  * batch rule loop ([[PromQlRules.evaluate]]) recomputed over the
  * surviving samples — after appends, after deletes (including the
  * min/max hybrid recompute arm), with matchers, in both the per-series
  * and the `agg by (labels)` forms.
  */
class PromQlRecordSpec extends SparkSuite {

  private lazy val metrics = Firehose.tagFilter(
    Firehose.metricsFromEvents(spark, sfDir))
    .select("component", "name", "labels", "timestamp", "id", "value")

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  private def rendered(df: DataFrame): Map[(String, String, Long), Double] =
    df.select("name", "series", "win_start", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r.getDouble(3))
      .toMap

  /** The batch loop's answer over `samples` for a one-line rule file. */
  private def batch(rule: String, samples: DataFrame): Map[(String, String, Long), Double] = {
    val name = rule.split('=').head.trim
    rendered(PromQlRules.evaluate(rule, samples)(name))
  }

  test("sum by (user) lifecycle: create, append-refresh, delete-refresh == batch") {
    val rule = "app:views:1h = sum by (user) (sum_over_time(view_total[1h]))"
    val src = tmp("rec-src"); val view = tmp("rec-view")
    val part = col("id").cast("long") % 3
    Versioned.appendCommit(metrics.filter(part =!= 0), src)
    PromQlRecord.create(spark, rule, src, view)
    // the create-only view equals the batch loop on the partial corpus
    assert(rendered(PromQlRecord.read(spark, view)) ===
      batch(rule, metrics.filter(part =!= 0)))
    // append span: O(delta) self-maintaining sums
    Versioned.appendCommit(metrics.filter(part === 0), src)
    assert(PromQlRecord.refresh(spark, view) >= 0)
    assert(rendered(PromQlRecord.read(spark, view)) === batch(rule, metrics))
    // delete span (touches every metric name — the view's WHERE filters
    // the feed, so only view_total retractions reach the evidence)
    Versioned.deleteWhere(spark, src, "id", col("id").cast("long") % 7 === 0)
    assert(PromQlRecord.refresh(spark, view) >= 0)
    val survivors = metrics.filter(col("id").cast("long") % 7 =!= 0)
    assert(rendered(PromQlRecord.read(spark, view)) === batch(rule, survivors))
    // caught-up refresh is a no-op
    assert(PromQlRecord.refresh(spark, view) === -1L)
  }

  test("per-series min with a delete span rides the hybrid recompute arm") {
    val rule = "err:min:1h = min_over_time(error_total[1h])"
    val src = tmp("recmin-src"); val view = tmp("recmin-view")
    Versioned.appendCommit(metrics, src)
    PromQlRecord.create(spark, rule, src, view)
    assert(rendered(PromQlRecord.read(spark, view)) === batch(rule, metrics))
    // delete a value-keyed slice so some windows lose their minimum —
    // exactly the non-self-maintainable case the recompute arm covers
    Versioned.deleteWhere(spark, src, "id",
      col("name") === "error_total" && col("value") < 1.0)
    assert(PromQlRecord.refresh(spark, view) >= 0)
    val survivors = metrics.filter(
      !(col("name") === "error_total" && col("value") < 1.0))
    assert(rendered(PromQlRecord.read(spark, view)) === batch(rule, survivors))
  }

  test("count / avg / matcher forms equal the batch loop") {
    val src = tmp("recmix-src")
    Versioned.appendCommit(metrics, src)
    // the FLAT sample count composes as sum-of-counts (count by would
    // count series — refused below)
    val cnt = "clicks:cnt = sum by (user) (count_over_time(click_total[1h]))"
    val cv = tmp("recmix-cnt")
    PromQlRecord.create(spark, cnt, src, cv)
    assert(rendered(PromQlRecord.read(spark, cv)) === batch(cnt, metrics))
    // per-series avg derives sum/cnt at read — decimal division, so
    // compare within 1e-9 of the batch loop's double division
    val av = "views:avg = avg_over_time(view_total[1h])"
    val avv = tmp("recmix-avg")
    PromQlRecord.create(spark, av, src, avv)
    val got = rendered(PromQlRecord.read(spark, avv))
    val want = batch(av, metrics)
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-9, k) }
    // a regex matcher lowers to the view's WHERE with the compiler's
    // anchored-regex spelling
    val re = """v:some = sum_over_time(view_total{user=~"1|2|3.*"}[1h])"""
    val rv = tmp("recmix-re")
    PromQlRecord.create(spark, re, src, rv)
    assert(rendered(PromQlRecord.read(spark, rv)) === batch(re, metrics))
  }

  test("a source compact is a watermark-only refresh; rows unchanged") {
    val rule = "v:sum = sum by (user) (sum_over_time(view_total[1h]))"
    val src = tmp("reccomp-src"); val view = tmp("reccomp-view")
    val part = col("id").cast("long") % 2
    Versioned.appendCommit(metrics.filter(part === 0), src)
    Versioned.appendCommit(metrics.filter(part =!= 0), src)
    PromQlRecord.create(spark, rule, src, view)
    val before = rendered(PromQlRecord.read(spark, view))
    val filesBefore = Versioned.manifest(src, Versioned.latestVersion(src)).size
    Versioned.compact(spark, src)
    assert(PromQlRecord.refresh(spark, view) >= 0)
    assert(rendered(PromQlRecord.read(spark, view)) === before)
    assert(Versioned.manifest(src, Versioned.latestVersion(src)).size <= filesBefore)
  }

  test("nameless and __name__-matcher selectors span metrics, grouped per (name, series)") {
    val src = tmp("recname-src")
    Versioned.appendCommit(metrics, src)
    // rows stay distinct per underlying metric even after the rule
    // rename (the batch loop's recorded-series rename behaves the same)
    // — compare as sorted multisets, not maps
    def multiset(df: DataFrame): Seq[(String, String, Long, Double)] =
      df.select("name", "series", "win_start", "value").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sorted
    val rule = """all:u7 = sum_over_time({user="7"}[1h])"""
    val view = tmp("recname-view")
    PromQlRecord.create(spark, rule, src, view)
    val name = rule.split('=').head.trim
    assert(multiset(PromQlRecord.read(spark, view)) ===
      multiset(PromQlRules.evaluate(rule, metrics)(name)))
    // a __name__ regex matcher reads the name COLUMN, not the label map
    val re = """some:v = max_over_time({__name__=~"view_.*|error_.*", user="3"}[1h])"""
    val rv = tmp("recname-re")
    PromQlRecord.create(spark, re, src, rv)
    val got = multiset(PromQlRecord.read(spark, rv))
    assert(got.nonEmpty &&
      got === multiset(PromQlRules.evaluate(re, metrics)("some:v")))
  }

  test("streaming: per-micro-batch landing + rule refresh tracks the batch loop") {
    val rule = "v:1h = sum by (user) (sum_over_time(view_total[1h]))"
    val src = tmp("recs-src"); val view = tmp("recs-view")
    // seed landing so the view has a create baseline
    Versioned.appendCommit(metrics.filter(col("id").cast("long") % 2 === 0), src)
    PromQlRecord.create(spark, rule, src, view)
    val dir = Files.createTempDirectory("recs-in").toFile
    val chk = Files.createTempDirectory("recs-chk").toFile
    def landLine(f: String, json: String): Unit =
      Files.write(dir.toPath.resolve(f), json.getBytes)
    landLine("b1.json",
      """{"component":"app","name":"view_total","labels":{"user":"77"},"timestamp":100,"id":"x1","value":5.25}
        |{"component":"app","name":"error_total","labels":{"user":"77"},"timestamp":130,"id":"x2","value":1.0}""".stripMargin)
    val stream = spark.readStream
      .schema("component STRING, name STRING, labels MAP<STRING,STRING>, " +
        "timestamp LONG, id STRING, value DOUBLE")
      .json(dir.getAbsolutePath)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          Versioned.appendCommit(batch.coalesce(1), src)
          PromQlRecord.refresh(spark, view)
          ()
        }
      }
      .option("checkpointLocation", chk.getAbsolutePath)
      .start()
    try {
      q.processAllAvailable()
      val landed1 = Versioned.latest(spark, src)
      assert(rendered(PromQlRecord.read(spark, view)) === batch(rule, landed1))
      // the new series landed (error_total filtered out by the WHERE)
      assert(rendered(PromQlRecord.read(spark, view))
        .get(("v:1h", "user=77", 0L)).contains(5.25))
      landLine("b2.json",
        """{"component":"app","name":"view_total","labels":{"user":"77"},"timestamp":200,"id":"x3","value":1.75}""")
      q.processAllAvailable()
      assert(rendered(PromQlRecord.read(spark, view))
        .get(("v:1h", "user=77", 0L)).contains(7.0))
      assert(rendered(PromQlRecord.read(spark, view)) ===
        batch(rule, Versioned.latest(spark, src)))
    } finally q.stop()
  }

  test("non-incrementalizable rules refuse loudly with the supported grammar") {
    val src = tmp("recref-src")
    Versioned.appendCommit(metrics.limit(10), src)
    def refused(rule: String): Unit = {
      val e = intercept[PromQlCompileException](
        PromQlRecord.create(spark, rule, src, tmp("recref-view")))
      assert(e.getMessage.contains("incremental recording supports"), rule)
    }
    refused("r = increase(view_total[1h])")                  // lag, not a group agg
    refused("r = avg by (user) (avg_over_time(view_total[1h]))") // avg-of-avgs
    refused("r = count by (user) (count_over_time(view_total[1h]))") // series count
    refused("r = sum by (user) (min_over_time(view_total[1h]))") // op/fn mismatch
    refused("r = sum_over_time(view_total[1h] offset 1h)")   // offset
    refused("r = sum_over_time(view_total[1h:30m])")         // subquery
    refused("r = view_total + 1")                            // binary
  }
}
