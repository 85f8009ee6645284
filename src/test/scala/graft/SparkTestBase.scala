package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one per suite, lazily started). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.builder("local[4]", "4")
    .appName("graft-test")
    .getOrCreate()

  val sf: String = "/root/testdata/sf0.001"
}
