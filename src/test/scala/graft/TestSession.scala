package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (cheap to reuse, expensive to
  * recreate). */
object TestSession {
  lazy val spark: SparkSession = graft.core.GraftSession.local(cores = 8)
  val sfDir = "/root/testdata/sf0.001"
}
