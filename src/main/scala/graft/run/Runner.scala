package graft.run

import org.apache.spark.sql.SparkSession
import java.time.LocalDate
import java.util.concurrent.{ConcurrentHashMap, Semaphore}

/** C6/K7: pluggable failure notifier (plugins/slack.py:6-26 — the reference
  * POSTs failure text to a Slack incoming webhook via on_failure_callback).
  * The transport is a function so production wires an HTTP POST and tests
  * wire a buffer; the payload format matches the reference's
  * `{"text": ...}` body.
  */
trait Notifier { def notifyFailure(job: String, error: Throwable): Unit }

object Notifier {
  val noop: Notifier = (_, _) => ()

  // JSON string escape: quotes/backslashes/control chars in an exception
  // message (SQL fragments, file paths, newlines) would otherwise produce an
  // invalid payload — on exactly the failure path the notifier exists for.
  private def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  final class Webhook(post: String => Unit) extends Notifier {
    def notifyFailure(job: String, error: Throwable): Unit = {
      val msg = Option(error.getMessage).getOrElse(error.getClass.getSimpleName)
      post(s"""{"text": "${jsonEscape(s"task failed: $job - $msg")}"}""")
    }
  }
}

/** C5: retry budget — reference default 1 retry / 3 min delay
  * (NameGenderCSVtoRedshift_v2.py:84-87; summaries use 1 min,
  * Build_Summary_v2.py:26-27).
  */
final case class RetryPolicy(retries: Int = 1, delayMillis: Long = 180000L)

/** C4/C8: typed run parameters — the run date is a plain value threaded to
  * incremental reads/writes (MySQL_to_Redshift_v2.py:36's execution_date),
  * never string templating.
  */
final case class RunContext(
    spark: SparkSession,
    runDate: LocalDate,
    params: Map[String, String] = Map.empty)

final case class Job(name: String, run: RunContext => Unit)

final class ConcurrentRunException(name: String)
  extends RuntimeException(s"pipeline '$name' is already running (max_active_runs=1)")

/** The thin job-runner replacing the reference's Airflow orchestration
  * (SURVEY.md §2.12): linear chains (C1), fan-out over a shared upstream
  * (C2), data passing as plain Scala values (C3), retries with delay (C5),
  * failure callbacks (C6), and a per-pipeline concurrency guard (C7,
  * max_active_runs=1). Scheduling itself stays external — the engine takes
  * a runDate and is idempotent per date, which is what made the reference's
  * cron+catchup model safe.
  */
final class JobRunner(
    retry: RetryPolicy = RetryPolicy(),
    notifier: Notifier = Notifier.noop,
    sleep: Long => Unit = Thread.sleep) {

  /** C1: extract >> transform >> load. Fails fast: a failed job (after
    * retries) aborts the chain, like a failed Airflow task skipping
    * downstreams.
    */
  def runChain(ctx: RunContext, jobs: Job*): Unit = jobs.foreach(runOne(ctx, _))

  /** C2: t1 >> [t2, t3] — downstream jobs observe upstream effects via
    * shared state (a cached DataFrame, a written table), not serialization.
    */
  def runFanOut(ctx: RunContext, upstream: Job, downstream: Seq[Job]): Unit = {
    runOne(ctx, upstream)
    downstream.foreach(runOne(ctx, _))
  }

  /** Retry loop: attempts = retries + 1; delay between attempts; the
    * failure callback fires once, on final failure, then rethrows. Only
    * NonFatal errors are retried: an OutOfMemoryError means a possibly
    * corrupted JVM (rerunning in it is worse than dying), and retrying
    * InterruptedException would defeat cancellation.
    */
  private def runOne(ctx: RunContext, job: Job): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      try { job.run(ctx); done = true }
      catch {
        case scala.util.control.NonFatal(_) if attempt < retry.retries =>
          attempt += 1
          sleep(retry.delayMillis)
        case e: Throwable =>
          notifier.notifyFailure(job.name, e)
          throw e
      }
    }
  }
}

/** C7: max_active_runs=1 per pipeline name. */
object PipelineLock {
  private val locks = new ConcurrentHashMap[String, Semaphore]()

  def withLock[T](name: String)(body: => T): T = {
    val sem = locks.computeIfAbsent(name, _ => new Semaphore(1))
    if (!sem.tryAcquire()) throw new ConcurrentRunException(name)
    try body finally sem.release()
  }
}
