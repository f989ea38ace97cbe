package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.{BeforeAndAfterAll, Suite}

/** One shared local session per suite run (getOrCreate dedups across
  * suites in the same JVM). */
trait TestSession extends BeforeAndAfterAll { self: Suite =>
  lazy val spark: SparkSession = TestSession.shared

  val sfDir = "/root/testdata/sf0.001"
}

object TestSession {
  lazy val shared: SparkSession = Engine.ready(Engine.configure(
    SparkSession.builder().master("local[4]").appName("graft-test"), 4)
    .getOrCreate())
}
