package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM, one session). */
object TestSpark {
  lazy val spark: SparkSession = graft.core.Sessions.local(4)

  /** Run `body` against a DEDICATED derived session (`newSession()` —
    * own SQLConf, shared SparkContext and cache manager) carrying the
    * given confs. The previous spelling mutated the SHARED session's
    * conf under a lock, which serialized mutators but left a racy
    * window open for concurrent suites that merely READ the shared
    * conf (a plan audit relying on defaults could observe
    * autoBroadcastJoinThreshold=-1 mid-flight); a derived session
    * closes that class entirely — nothing is ever restored because
    * nothing shared is ever touched. Frames built from the SHARED
    * session must be re-bound with `SessionBridge.inSession` before
    * planning, or the override won't reach their planner.
    */
  def withConfs[T](confs: (String, String)*)(body: SparkSession => T): T = {
    val s = spark.newSession()
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    body(s)
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}
