package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session fixture: one local session reused across all suites (tests
  * fork a single JVM, so `getOrCreate` returns the same session).
  */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(4, appName = "graft-test")
  val sfDir = "/root/testdata/sf0.001"
}
