package graft

import org.scalatest.funsuite.AnyFunSuite

/** Failure-path contract of the fixture-chain overlap helper: when one
  * chain fails, the SIBLING chains are stopped (interrupted + drained)
  * before the exception unwinds — a straggler that kept writing its
  * temp store dir while the caller deleted it (or timed the next bench
  * query) was the r18-advice race. */
class InParallelSpec extends AnyFunSuite {

  test("inParallel rethrows the original failure cause") {
    val boom = new IllegalStateException("chain failed")
    val got = intercept[IllegalStateException] {
      PipelineQueries.inParallel(
        () => throw boom,
        () => Thread.sleep(50))
    }
    assert(got eq boom, "the ExecutionException wrapper leaked")
  }

  test("on failure, sibling chains are interrupted and drained before " +
      "the exception unwinds") {
    val siblingFinished = new java.util.concurrent.atomic.AtomicBoolean(false)
    val siblingInterrupted = new java.util.concurrent.atomic.AtomicBoolean(false)
    val siblingStarted = new java.util.concurrent.CountDownLatch(1)
    intercept[IllegalStateException] {
      PipelineQueries.inParallel(
        () => {
          // fail only once the sibling is demonstrably mid-flight
          siblingStarted.await()
          throw new IllegalStateException("first chain fails")
        },
        () => {
          siblingStarted.countDown()
          try {
            Thread.sleep(30000) // a long store chain, mid-write
            siblingFinished.set(true) // would be the leaked writer
          } catch {
            case _: InterruptedException => siblingInterrupted.set(true)
          }
        })
    }
    // by the time inParallel unwound, the sibling must have been stopped:
    // interrupted, and definitely not left running to completion later
    assert(siblingInterrupted.get,
      "sibling chain was not interrupted on failure")
    assert(!siblingFinished.get,
      "sibling chain kept running after inParallel rethrew")
  }
}
