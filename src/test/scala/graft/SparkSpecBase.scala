package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for specs (one JVM per sbt test fork). */
object SparkSpecBase {
  lazy val spark: SparkSession =
    graft.engine.GraftSession.local(cores = 4, shufflePartitions = 8, appName = "graft-test")
}

abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  def spark: SparkSession = SparkSpecBase.spark
  val sfDir = "/root/testdata/sf0.001"
}
