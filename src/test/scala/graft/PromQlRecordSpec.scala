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
    refused("r = sum by (user) (increase(view_total[1h]))")  // lag under an agg
    // static rule labels lower since round 15 (m58 parity) — see the
    // labeled-rule lifecycle specs below
    refused("r = avg by (user) (avg_over_time(view_total[1h]))") // avg-of-avgs
    refused("r = count by (user) (count_over_time(view_total[1h]))") // series count
    refused("r = sum by (user) (min_over_time(view_total[1h]))") // op/fn mismatch
    refused("r = sum_over_time(view_total[1h] offset 1h)")   // offset
    refused("r = sum_over_time(view_total[1h:30m])")         // subquery
    refused("r = view_total + 1")                            // binary
    refused("r = increase(view_total[1h] offset 1h)")        // counter + offset
    refused("r = rate(view_total[1h] @ 120)")                // counter + pin
  }

  test("static rule labels maintain incrementally, equal to the batch " +
      "evaluator's m58 merge, on every lowering") {
    // no-by form: statics merge over the full series label set (rule
    // wins — `unit` is overridden, `tier` added); per-source-series
    // granularity preserved through the merged group column
    val rule = """app:v:lab1h = sum_over_time(view_total[1h]) """ +
      """labels {tier="gold", unit="mb"}"""
    val src = tmp("reclab-src"); val view = tmp("reclab-view")
    val part = col("id").cast("long") % 3
    Versioned.appendCommit(metrics.filter(part =!= 0), src)
    PromQlRecord.create(spark, rule, src, view)
    val afterCreate = rendered(PromQlRecord.read(spark, view))
    assert(afterCreate === batch(rule, metrics.filter(part =!= 0)))
    assert(afterCreate.keys.forall(_._2.contains("tier=gold")))
    assert(afterCreate.keys.forall(k =>
      k._2.contains("unit=mb") && !k._2.contains("unit=bytes")))
    // O(delta) refresh through an append AND a delete span
    Versioned.appendCommit(metrics.filter(part === 0), src)
    assert(PromQlRecord.refresh(spark, view) >= 0)
    assert(rendered(PromQlRecord.read(spark, view)) === batch(rule, metrics))
    Versioned.deleteWhere(spark, src, "id", col("id").cast("long") % 7 === 0)
    assert(PromQlRecord.refresh(spark, view) >= 0)
    assert(rendered(PromQlRecord.read(spark, view)) ===
      batch(rule, metrics.filter(col("id").cast("long") % 7 =!= 0)))

    // by form: statics merge over the by-values (added key)
    val ruleBy = """app:v:lab1hby = sum by (user) """ +
      """(sum_over_time(view_total[1h])) labels {tier="gold"}"""
    val srcB = tmp("reclabby-src"); val viewB = tmp("reclabby-view")
    Versioned.appendCommit(metrics.filter(part =!= 0), srcB)
    PromQlRecord.create(spark, ruleBy, srcB, viewB)
    Versioned.appendCommit(metrics.filter(part === 0), srcB)
    assert(PromQlRecord.refresh(spark, viewB) >= 0)
    val gotBy = rendered(PromQlRecord.read(spark, viewB))
    assert(gotBy === batch(ruleBy, metrics))
    assert(gotBy.nonEmpty && gotBy.keys.forall(_._2.contains("tier=gold")))
    // ...and a static OVERRIDING a by-label (rule wins, per Prometheus)
    val ruleBy2 = """app:v:lab1hby2 = sum by (user) """ +
      """(sum_over_time(view_total{user="1"}[1h])) labels {user="all"}"""
    val srcB2 = tmp("reclabby2-src"); val viewB2 = tmp("reclabby2-view")
    Versioned.appendCommit(metrics, srcB2)
    PromQlRecord.create(spark, ruleBy2, srcB2, viewB2)
    val gotBy2 = rendered(PromQlRecord.read(spark, viewB2))
    assert(gotBy2 === batch(ruleBy2, metrics))
    assert(gotBy2.nonEmpty && gotBy2.keys.forall(_._2 === "user=all"))

    // counter form: increase with statics through create + refresh
    val ruleC = """app:v:labinc = increase(view_total[1h]) """ +
      """labels {tier="gold", unit="mb"}"""
    val srcC = tmp("reclabc-src"); val viewC = tmp("reclabc-view")
    Versioned.appendCommit(metrics.filter(col("timestamp") <= cut1), srcC)
    PromQlRecord.create(spark, ruleC, srcC, viewC)
    assert(rendered(PromQlRecord.read(spark, viewC)) ===
      batch(ruleC, metrics.filter(col("timestamp") <= cut1)))
    Versioned.appendCommit(metrics.filter(col("timestamp") > cut1), srcC)
    assert(PromQlRecord.refresh(spark, viewC) >= 0)
    val gotC = rendered(PromQlRecord.read(spark, viewC))
    assert(gotC === batch(ruleC, metrics))
    assert(gotC.nonEmpty && gotC.keys.forall(k =>
      k._2.contains("tier=gold") && k._2.contains("unit=mb")))
  }

  // ───────────────── increase / rate counter rules ─────────────────

  /** Timestamp cut points splitting the stream into three PER-SERIES
    * IN-ORDER landings — the append-only lineage counter rules maintain.
    */
  private lazy val (cut1, cut2) = {
    val r = metrics.agg(
      expr("percentile(timestamp, 0.4)"), expr("percentile(timestamp, 0.7)"))
      .head()
    (r.getDouble(0).toLong, r.getDouble(1).toLong)
  }

  test("increase lifecycle: create, two append-span refreshes == batch loop") {
    val rule = "app:views:inc1h = increase(view_total[1h])"
    val src = tmp("recinc-src"); val view = tmp("recinc-view")
    Versioned.appendCommit(metrics.filter(col("timestamp") <= cut1), src)
    PromQlRecord.create(spark, rule, src, view)
    assert(rendered(PromQlRecord.read(spark, view)) ===
      batch(rule, metrics.filter(col("timestamp") <= cut1)))
    // first append span: state rows seed the boundary-crossing deltas
    Versioned.appendCommit(
      metrics.filter(col("timestamp") > cut1 && col("timestamp") <= cut2), src)
    assert(PromQlRecord.refresh(spark, view) >= 0)
    assert(rendered(PromQlRecord.read(spark, view)) ===
      batch(rule, metrics.filter(col("timestamp") <= cut2)))
    // second append span; final view equals the batch loop over all
    // samples bit-exactly (per-refresh decimal partials add exactly)
    Versioned.appendCommit(metrics.filter(col("timestamp") > cut2), src)
    assert(PromQlRecord.refresh(spark, view) >= 0)
    assert(rendered(PromQlRecord.read(spark, view)) === batch(rule, metrics))
    // caught-up refresh is a no-op
    assert(PromQlRecord.refresh(spark, view) === -1L)
  }

  test("rate + matcher form equals the batch loop through a refresh") {
    val rule = """app:v17:rate = rate(view_total{user=~"1.*|7"}[2h])"""
    val src = tmp("recrate-src"); val view = tmp("recrate-view")
    Versioned.appendCommit(metrics.filter(col("timestamp") <= cut2), src)
    PromQlRecord.create(spark, rule, src, view)
    Versioned.appendCommit(metrics.filter(col("timestamp") > cut2), src)
    assert(PromQlRecord.refresh(spark, view) >= 0)
    val got = rendered(PromQlRecord.read(spark, view))
    val want = batch(rule, metrics)
    assert(got.keySet === want.keySet && got.nonEmpty)
    // rate divides the exact decimal increase by R as the last step —
    // one double division, like the compiler
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12, k) }
  }

  test("a source compact is a watermark-only refresh for counter rules too") {
    val rule = "app:views:inc = increase(view_total[1h])"
    val src = tmp("reccompinc-src"); val view = tmp("reccompinc-view")
    Versioned.appendCommit(metrics.filter(col("timestamp") <= cut1), src)
    Versioned.appendCommit(metrics.filter(col("timestamp") > cut1), src)
    PromQlRecord.create(spark, rule, src, view)
    val before = rendered(PromQlRecord.read(spark, view))
    Versioned.compact(spark, src)
    assert(PromQlRecord.refresh(spark, view) >= 0)
    assert(rendered(PromQlRecord.read(spark, view)) === before)
    // compact + append in ONE span: the compact's pairs net out, the
    // appended samples maintain
    Versioned.compact(spark, src)
    Versioned.appendCommit(metrics.filter(col("timestamp") > cut1)
      .withColumn("timestamp", col("timestamp") + lit(10000000L))
      .withColumn("id", concat(lit("re-"), col("id"))), src)
    assert(PromQlRecord.refresh(spark, view) >= 0)
    assert(rendered(PromQlRecord.read(spark, view)) ===
      batch(rule, Versioned.latest(spark, src)))
  }

  test("counter rules refuse delete spans and out-of-order appends loudly") {
    val rule = "app:views:inc = increase(view_total[1h])"
    val src = tmp("recrefinc-src"); val view = tmp("recrefinc-view")
    Versioned.appendCommit(metrics.filter(col("timestamp") > cut1), src)
    PromQlRecord.create(spark, rule, src, view)
    // an append BEHIND the recorded heads (the earlier tercile) refuses
    Versioned.appendCommit(metrics.filter(col("timestamp") <= cut1), src)
    val e1 = intercept[IllegalStateException](PromQlRecord.refresh(spark, view))
    assert(e1.getMessage.contains("recorded head"))
    // rebuild (create is always sound — here over BOTH landings), then
    // a delete span refuses
    val view2 = tmp("recrefinc-view2")
    PromQlRecord.create(spark, rule, src, view2)
    Versioned.deleteWhere(spark, src, "id", col("id").cast("long") % 11 === 0)
    val e2 = intercept[IllegalStateException](PromQlRecord.refresh(spark, view2))
    assert(e2.getMessage.contains("APPEND-ONLY"))
    // the refused refresh left the view untouched (watermark and rows)
    assert(rendered(PromQlRecord.read(spark, view2)) === batch(rule, metrics))
  }
}
