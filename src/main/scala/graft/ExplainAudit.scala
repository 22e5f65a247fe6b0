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
