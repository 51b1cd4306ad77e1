package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide session; suites run in the
  * forked test JVM).
  */
object TestSession {
  lazy val spark: SparkSession =
    Sessions.builder("local[4]", 4).appName("graft-test").getOrCreate()
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  spark.sparkContext.setLogLevel("ERROR")
}
