package graft.util

/**
 * Driver-side concurrency for INDEPENDENT Spark actions: jobs launched
 * from separate threads share the session's scheduler, so a sequence
 * of small metadata/commit/probe jobs collapses to its slowest member
 * instead of paying per-job latency serially — the machinery-probe
 * discipline every multi-leg verb and fsck battery uses. Not for
 * dependent work: the thunks must not rely on each other's effects.
 */
object Par {
  def par[T](fs: Seq[() => T]): Seq[T] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    Await.result(Future.sequence(fs.map(f => Future(f()))), Duration.Inf)
  }
}
