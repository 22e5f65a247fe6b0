package graft

/** Driver-contract guard: every declared query must execute at smoke scale,
  * and every oracle key must name a real query (the driver's compare treats
  * a missing/renamed key as a silent correctness zero).
  */
class ContractSpec extends SparkSuite {

  test("oracle keys are exactly a subset of query keys") {
    val queries = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- queries
    assert(orphans.isEmpty, s"oracle entries without a query: $orphans")
    val rowsOnly = queries -- SparkEntry.oracleSql.keySet
    // rows-only queries are the deliberate, documented exceptions: solver
    // outputs (KMeans cells, LR coefficients) have no portable oracle and
    // are spec-verified instead (recall floor / agreement floor)
    assert(rowsOnly === Set("s3_ann_ivf", "t10_quality_model"),
      s"unexpected rows-only set: $rowsOnly")
  }

  test("every declared query executes at smoke scale") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).count()
        None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("the flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
