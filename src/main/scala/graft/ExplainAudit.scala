package graft
import org.apache.spark.sql.SparkSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8)
    val dir = "/root/testdata/sf0.01"
    // `--scans` mode: per-query census of how often each base table appears
    // in the optimized plan — the quick sweep for accidentally-duplicated
    // corpus scans (legitimate multi-reads exist; >2 of one table is the
    // smell worth a look)
    if (args.headOption.contains("--scans")) {
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try {
          val leaves = fn(spark, dir).queryExecution.optimizedPlan.collectLeaves()
          val names = leaves.collect {
            case lr: LogicalRelation => lr.relation match {
              case h: HadoopFsRelation =>
                h.location.rootPaths.headOption.map(_.getName).getOrElse("?")
              case _ => "non-file"
            }
          }
          val counts = names.groupBy(identity).view.mapValues(_.size).toSeq.sortBy(_._1)
          val flag = if (counts.exists(_._2 > 2)) "  <== >2 scans" else ""
          println(s"$name: ${counts.map { case (t, c) => s"$t=$c" }.mkString(" ")}$flag")
        } catch { case e: Throwable => println(s"$name: ERR ${e.getMessage.take(120)}") }
      }
      spark.stop()
      return
    }
    // `--dump <outDir> <suffix> [names]`: write `.explain("formatted")` of
    // each query to `<outDir>/<name>_<suffix>.txt` — the optimization-round
    // evidence files (plans/r17/<query>_{before,after}.txt). Queries that
    // LAND state to build their plan (p9–p13, m53–m57 …) execute their
    // setup commits as a side effect of constructing the DataFrame; the
    // dumped plan is the final declared query's plan, which is the one
    // the round's claims are about.
    if (args.headOption.contains("--dump")) {
      val outDir = args(1)
      val suffix = args(2)
      val names = args.drop(3).headOption.map(_.split(",").toSet)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        if (names.forall(_.contains(name))) {
          val txt =
            try fn(spark, dir).queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            catch { case e: Throwable => "ERR " + e.getMessage }
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), txt)
          println(s"dumped $name (${txt.length} chars)")
        }
      }
      spark.stop()
      return
    }
    val targets = args.headOption.map(_.split(",").toSet)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (targets.forall(_.contains(name))) {
        println(s"\n========== $name ==========")
        try println(fn(spark, dir).queryExecution.optimizedPlan.toString.take(2500))
        catch { case e: Throwable => println("ERR " + e.getMessage.take(200)) }
      }
    }
    spark.stop()
  }
}
