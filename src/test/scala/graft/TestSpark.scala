package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (extensions
  * registered, small core count). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("4").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  /** smallest driver-generated dataset */
  val sfDir = "/root/testdata/sf0.001"
}
