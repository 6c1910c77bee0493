package graft.util

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** Driver-side concurrency helper: results keep item order, and a
  * failing task must not abandon its siblings mid-flight (they may be
  * running Spark jobs and mutating shared caches).
  */
class ParSpec extends AnyFunSuite {

  test("mapAll keeps item order") {
    assert(Par.mapAll(1 to 20)(_ * 2) === (2 to 40 by 2))
  }

  test("mapAll drains every task before rethrowing the first failure") {
    val completed = new AtomicInteger(0)
    val ex = intercept[RuntimeException] {
      Par.mapAll(1 to 8) { i =>
        if (i == 3) throw new RuntimeException("boom")
        // siblings finish AFTER the failing task has already thrown
        Thread.sleep(100)
        completed.incrementAndGet()
      }
    }
    assert(ex.getMessage === "boom")
    assert(completed.get() === 7,
      "a sibling task was abandoned while still running")
  }
}
