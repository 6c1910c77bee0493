package graft.util

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.Try

/** Driver-side concurrency for independent per-partition Spark work:
  * submitting jobs from several driver threads lets Spark's scheduler
  * interleave them instead of running P serial critical paths. Only
  * valid when the tasks are independent and their outputs are
  * order-canonical (see BundleIO's sorted writes).
  */
object Par {
  /** Evaluate `f` over `items` concurrently; results keep item order.
    * Every task is DRAINED before the first failure is rethrown: each
    * future completes with a `Try`, so a failing partition never leaves
    * sibling Spark jobs running (and mutating shared caches) behind an
    * already-propagated exception.
    */
  def mapAll[A, B](items: Seq[A])(f: A => B): Seq[B] = {
    implicit val ec: ExecutionContext = ExecutionContext.global
    val tries = Await.result(
      Future.sequence(items.map(a => Future(Try(f(a))))), Duration.Inf)
    tries.map(_.get)
  }
}
