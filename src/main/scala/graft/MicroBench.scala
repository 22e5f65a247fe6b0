package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Micro-benchmarks for hot shared expressions (guide §1.4: noop sink, so
  * the timed action computes every row and discards it). Each case runs
  * `reps` times; report the min. Usage:
  * `sbt "runMain graft.MicroBench [sfDir]"`.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import graft.operators.Firehose

    val m = Tables.materializeSmall(
      Firehose.tagFilter(Firehose.metricsFromEvents(spark, sfDir)))
    m.count()

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String, reps: Int = 5)(df: => DataFrame): Unit = {
      val d = df
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        noop(d)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"MICRO $name%-34s min=${times.min}%7.3fs all=${times.map(t => f"$t%.2f").mkString(",")}")
    }

    time("baseline: select id")(m.select(col("id")))
    time("select labels (map passthrough)")(m.select(col("labels")))
    time("seriesKey render")(m.select(Firehose.seriesKey(col("labels")).as("s")))
    time("sort+join, NO escape")(
      m.select(array_join(
        transform(array_sort(map_entries(col("labels"))),
          e => concat(e.getField("key"), lit("="), e.getField("value"))),
        ",").as("s")))
    time("gaugeLatestLabeled")(Firehose.gaugeLatestLabeled(m))
    time("render(gaugeLatest)")(
      Firehose.promRender(Firehose.gaugeLatestLabeled(m)))
    time("parse(render(gaugeLatest)) [m21]")(
      Firehose.promParse(Firehose.promRender(Firehose.gaugeLatestLabeled(m))))
    spark.stop()
  }
}
