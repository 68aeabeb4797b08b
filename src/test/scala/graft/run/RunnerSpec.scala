package graft.run

import graft.SparkSpec
import java.time.LocalDate
import scala.collection.mutable.ListBuffer

/** C5/C6/C7: retries with delay, failure callback fires once on final
  * failure, concurrency guard rejects a second active run.
  */
class RunnerSpec extends SparkSpec {

  private def ctx = RunContext(spark, LocalDate.of(2026, 1, 1))

  test("retry-then-succeed: a job failing once under retries=1 completes") {
    var attempts = 0
    val slept = ListBuffer.empty[Long]
    val runner = new JobRunner(RetryPolicy(retries = 1, delayMillis = 123),
      sleep = d => slept += d)
    runner.runChain(ctx, Job("flaky", _ => {
      attempts += 1
      if (attempts == 1) throw new RuntimeException("transient")
    }))
    assert(attempts === 2)
    assert(slept.toList === List(123L)) // delay honored between attempts
  }

  test("callback fires once on final failure, then the error propagates") {
    val notified = ListBuffer.empty[String]
    val notifier: Notifier = (job, _) => notified += job
    val runner = new JobRunner(RetryPolicy(retries = 1, delayMillis = 0),
      notifier = notifier, sleep = _ => ())
    intercept[RuntimeException] {
      runner.runChain(ctx, Job("doomed", _ => throw new RuntimeException("boom")))
    }
    assert(notified.toList === List("doomed")) // once, not per attempt
  }

  test("a failed job aborts the chain (downstream never runs)") {
    var downstream = false
    val runner = new JobRunner(RetryPolicy(retries = 0, delayMillis = 0), sleep = _ => ())
    intercept[RuntimeException] {
      runner.runChain(ctx,
        Job("fails", _ => throw new RuntimeException("x")),
        Job("after", _ => downstream = true))
    }
    assert(!downstream)
  }

  test("fan-out runs upstream before each downstream") {
    val order = ListBuffer.empty[String]
    val runner = new JobRunner(RetryPolicy(retries = 0, delayMillis = 0), sleep = _ => ())
    runner.runFanOut(ctx, Job("up", _ => order += "up"),
      Seq(Job("d1", _ => order += "d1"), Job("d2", _ => order += "d2")))
    assert(order.toList === List("up", "d1", "d2"))
  }

  test("Webhook notifier posts the reference's {\"text\": ...} payload") {
    val posts = ListBuffer.empty[String]
    new Notifier.Webhook(p => posts += p).notifyFailure("job_x", new RuntimeException("oops"))
    assert(posts.head.startsWith("""{"text": "task failed: job_x"""))
    assert(posts.head.contains("oops"))
  }

  test("Webhook payload stays valid JSON when the error message has quotes/newlines") {
    val posts = ListBuffer.empty[String]
    new Notifier.Webhook(p => posts += p)
      .notifyFailure("job_y", new RuntimeException("bad \"query\":\nline2\tend\\"))
    // a JSON parser must accept the payload produced on the failure path
    val parsed = spark.read.json(
      spark.createDataset(posts.toList)(org.apache.spark.sql.Encoders.STRING))
    val text = parsed.select("text").head().getString(0)
    assert(text === "task failed: job_y - bad \"query\":\nline2\tend\\")
  }

  test("fatal errors are not retried (no sleep, immediate propagation)") {
    var attempts = 0
    val slept = ListBuffer.empty[Long]
    val runner = new JobRunner(RetryPolicy(retries = 3, delayMillis = 999),
      sleep = d => slept += d)
    intercept[OutOfMemoryError] {
      runner.runChain(ctx, Job("fatal", _ => {
        attempts += 1
        throw new OutOfMemoryError("simulated")
      }))
    }
    assert(attempts === 1) // never rerun in a possibly corrupted JVM
    assert(slept.isEmpty)
  }

  test("PipelineLock rejects a concurrent second run and releases after") {
    val started = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() => PipelineLock.withLock("p1") {
      started.countDown(); release.await()
    })
    t.start(); started.await()
    intercept[ConcurrentRunException] { PipelineLock.withLock("p1")(()) }
    release.countDown(); t.join()
    // released: reacquire works
    PipelineLock.withLock("p1")(())
  }
}
