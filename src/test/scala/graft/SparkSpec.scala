package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session, UTC, AQE). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = Tables.configure(
      SparkSession.builder().master("local[4]").appName("graft-test"), "4")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"
  def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-test").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }
}
