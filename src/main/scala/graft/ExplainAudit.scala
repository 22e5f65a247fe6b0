package graft
import org.apache.spark.sql.SparkSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8)
    val dir = "/root/testdata/sf0.01"
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
