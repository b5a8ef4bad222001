package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test JVM (suites reuse it via
  * getOrCreate; `local[4]` keeps unit tests snappy).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("graft-test", Some("4")).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  lazy val sf: String = "/root/testdata/sf0.001"

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), prefix).toString
}
