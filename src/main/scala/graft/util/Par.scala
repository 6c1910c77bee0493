package graft.util

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Driver-side concurrency for independent per-partition Spark work:
  * submitting jobs from several driver threads lets Spark's scheduler
  * interleave them instead of running P serial critical paths. Only
  * valid when the tasks are independent and their outputs are
  * order-canonical (see BundleIO's sorted writes).
  */
object Par {
  /** Evaluate `f` over `items` concurrently; results keep item order. */
  def mapAll[A, B](items: Seq[A])(f: A => B): Seq[B] = {
    implicit val ec: ExecutionContext = ExecutionContext.global
    Await.result(Future.sequence(items.map(a => Future(f(a)))), Duration.Inf)
  }
}
