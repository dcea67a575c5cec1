package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM, one session). */
object TestSpark {
  lazy val spark: SparkSession = graft.core.Sessions.local(4)

  /** Run `body` with the given session confs set, restoring the prior
    * values after — SERIALIZED under one lock so conf-MUTATING arms
    * never interleave with each other. NOTE the residual race the
    * lock does NOT close (see the project memory note): a concurrent
    * suite that merely READS the shared session's conf (any plan
    * audit relying on defaults) is unsynchronized and can still
    * observe the mutated window; fully closing that needs a dedicated
    * session per conf-mutating arm. Every conf-mutating plan audit
    * goes through here rather than hand-rolling set/restore.
    */
  def withConfs[T](confs: (String, String)*)(body: => T): T =
    confLock.synchronized {
      val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  private object confLock
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}
