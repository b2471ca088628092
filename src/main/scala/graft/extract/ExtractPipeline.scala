package graft.extract

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.control.NonFatal

/** Concurrent three-stage ELT pipeline: introspect → extract → load.
  *
  * The reference runs queued worker pools per stage with retry
  * (pipeline.py Step/QueueWorker/QueueWorkerPool, main.py's tenacity
  * Retrying); here each stage is a bounded thread pool and a table
  * flows through as a Future chain — same overlap behavior (a table
  * loads while the next extracts), idiomatic Scala. Stage workloads
  * are driver-side orchestration; the heavy lifting inside
  * `extract` is a distributed Spark job.
  */
object ExtractPipeline {

  final case class Stages[A, B, C](
      introspect: String => A,
      extract: A => B,
      load: B => C)

  final case class Result[C](name: String, result: Either[Throwable, C])

  final case class RetryPolicy(attempts: Int = 3, backoffMs: Long = 50) {
    def apply[T](f: => T): T = {
      var last: Throwable = null
      var i = 0
      while (i < attempts) {
        try return f
        catch {
          case NonFatal(e) =>
            last = e
            Thread.sleep(backoffMs * (1L << i))
        }
        i += 1
      }
      throw last
    }
  }

  final case class DeadlineExceeded(table: String, deadlineMs: Long)
    extends RuntimeException(
      s"table $table unfinished after ${deadlineMs}ms deadline")

  /** Deterministic table-order shuffle (reference util.py:13-22
    * filter_shuffle): config files list tables grouped by schema, so
    * FIFO worker pools would hammer one tablespace/filegroup at a
    * time on the source DB; a shuffled order spreads concurrent
    * extracts across storage. Seeded so a rerun processes in the
    * same order (reproducible logs and deadline behavior).
    */
  def shuffleTables(tables: Seq[String], seed: Long): Seq[String] =
    new scala.util.Random(seed).shuffle(tables)

  /** Runs every table through all three stages with per-stage
    * parallelism caps (reference introspect_workers / extract_workers
    * / load_workers). Returns per-table results, failures captured
    * not thrown (reference error_queue).
    *
    * `deadlineMs` caps the whole run (the reference's TODO "deadline
    * flag that causes the extract to abort"): tables still in flight
    * when it expires come back as DeadlineExceeded failures instead
    * of blocking the batch window; finished tables keep their real
    * results.
    */
  def run[A, B, C](tables: Seq[String], stages: Stages[A, B, C],
                   introspectWorkers: Int = 4, extractWorkers: Int = 4,
                   loadWorkers: Int = 4,
                   retry: RetryPolicy = RetryPolicy(),
                   deadlineMs: Option[Long] = None,
                   shuffleSeed: Option[Long] = None): Seq[Result[C]] = {
    val ordered = shuffleSeed.fold(tables)(shuffleTables(tables, _))
    val pools = Seq(introspectWorkers, extractWorkers, loadWorkers)
      .map(n => Executors.newFixedThreadPool(n))
    val Seq(ec1, ec2, ec3) = pools.map(ExecutionContext.fromExecutorService)
    try {
      val futures: Seq[Future[Result[C]]] = ordered.map { t =>
        Future(retry(stages.introspect(t)))(ec1)
          .flatMap(a => Future(retry(stages.extract(a)))(ec2))(ec2)
          .flatMap(b => Future(retry(stages.load(b)))(ec3))(ec3)
          .map(c => Result(t, Right(c): Either[Throwable, C]))(ec3)
          .recover { case NonFatal(e) => Result(t, Left(e): Either[Throwable, C]) }(ec3)
      }
      import scala.concurrent.ExecutionContext.Implicits.global
      deadlineMs match {
        case None => Await.result(Future.sequence(futures), Duration.Inf)
        case Some(ms) =>
          try Await.ready(Future.sequence(futures), Duration(ms, "ms"))
          catch { case _: java.util.concurrent.TimeoutException => }
          ordered.zip(futures).map { case (t, f) =>
            f.value match {
              case Some(scala.util.Success(r)) => r
              case Some(scala.util.Failure(e)) =>
                Result(t, Left(e): Either[Throwable, C])
              case None =>
                Result(t, Left(DeadlineExceeded(t, ms)): Either[Throwable, C])
            }
          }
      }
    } finally pools.foreach(_.shutdownNow())
  }
}
