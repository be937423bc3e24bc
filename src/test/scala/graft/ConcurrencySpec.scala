package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import org.scalatest.funsuite.AnyFunSuite

/** Concurrent-query stability: the reference coordinator serves many
  * simultaneous queries; the Spark-native engine must return identical
  * answers when N entries evaluate concurrently on one SparkContext
  * (isolated child sessions, per-thread scheduler pools). This pins the
  * thread-safety of the query builders (memoized manifests/artifacts,
  * the engine's DynamicVariable flag scopes, shared Tables caches) —
  * value-level, since a race would corrupt results long before it
  * deadlocks. The FAIR-scheduler latency story is measured by
  * `graft.tools.ConcurrentBench` (scheduler mode is fixed at context
  * creation, so the shared FIFO test session cannot exercise it).
  */
class ConcurrencySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  private val names = Seq(
    "f1_eq", "a1_step_agg", "a5_percentile", "ast_chart_sum",
    "ast_formula_ratio", "e15_xml_extract", "o1_topk", "u3_set_ops")

  private def hashOf(df: org.apache.spark.sql.DataFrame): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    df.collect().map(_.toString).sorted
      .foreach(s => md.update(s.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  test("8 entries evaluated concurrently return the serial answers") {
    val serial = names.map(n =>
      n -> hashOf(SparkEntry.queries(n)(spark, dir))).toMap
    val pool = Executors.newFixedThreadPool(names.size)
    val start = new CountDownLatch(1)
    val out = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val futures = names.zipWithIndex.map { case (n, i) =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try {
            val sess = spark.newSession()
            sess.sparkContext.setLocalProperty("spark.scheduler.pool", s"q$i")
            start.await()
            out.put(n, hashOf(SparkEntry.queries(n)(sess, dir)))
          } catch { case t: Throwable => errs.add(t) }
      })
    }
    start.countDown()
    futures.foreach(_.get(300, TimeUnit.SECONDS))
    pool.shutdown()
    assert(errs.isEmpty, s"concurrent failures: ${errs.toArray.mkString(";")}")
    names.foreach { n =>
      assert(out.get(n) === serial(n), s"result drift under concurrency: $n")
    }
  }
}
