package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Par

/** Focused contract tests for [[graft.operators.Par.both]] — the
  * driver-action overlap primitive the r21 optimizations lean on.
  * The load-bearing properties: both sides run (concurrently), both
  * results come back, and a failure on EITHER side propagates only
  * after the other side has settled (no job may outlive the call —
  * callers sequence filesystem publishes after it returns).
  */
class ParSpec extends AnyFunSuite {

  test("both sides run and both results return") {
    val (a, b) = Par.both { 1 + 1 } { "x" * 3 }
    assert(a === 2)
    assert(b === "xxx")
  }

  test("the sides genuinely overlap (pool side + calling side)") {
    // a blocks until b has started — only possible if a and b run on
    // different threads at the same time; a latch-free sequential
    // execution would deadlock the 5 s poll and fail the assert
    val bStarted = new java.util.concurrent.CountDownLatch(1)
    val (aSawB, _) = Par.both {
      bStarted.await(5, java.util.concurrent.TimeUnit.SECONDS)
    } {
      bStarted.countDown()
      "done"
    }
    assert(aSawB, "pool side never observed the calling side running")
  }

  test("calling-side failure waits for the pool side, then rethrows") {
    val aFinished = new java.util.concurrent.atomic.AtomicBoolean(false)
    val ex = intercept[RuntimeException] {
      Par.both {
        Thread.sleep(150)
        aFinished.set(true)
      } {
        throw new RuntimeException("b failed")
      }
    }
    assert(ex.getMessage === "b failed")
    // the pool side must have settled BEFORE the rethrow — a caller
    // that publishes/cleans up in its catch must not race a's jobs
    assert(aFinished.get,
      "b's failure propagated while a was still running")
  }

  test("pool-side failure propagates after both settle") {
    val bFinished = new java.util.concurrent.atomic.AtomicBoolean(false)
    val ex = intercept[IllegalStateException] {
      Par.both {
        throw new IllegalStateException("a failed")
      } {
        Thread.sleep(50)
        bFinished.set(true)
      }
    }
    assert(ex.getMessage === "a failed")
    assert(bFinished.get)
  }

  test("the pool side inherits the caller's job group and drops it " +
      "after the call (cancellation scope + reused-thread hygiene)") {
    val sc = SparkSpec.session.sparkContext
    sc.setJobGroup("par-spec-group", "par-spec", true)
    try {
      val (seen, _) = Par.both {
        sc.getLocalProperty("spark.jobGroup.id")
      } { "b" }
      assert(seen === "par-spec-group",
        "pool side did not inherit the caller's job group — " +
          "cancelling the caller would leave the overlapped action " +
          "running")
      // the property must not leak to later work on the reused pool
      // thread: run an unscoped both() and require a clean group
      sc.clearJobGroup()
      val (after, _) = Par.both {
        Option(sc.getLocalProperty("spark.jobGroup.id"))
      } { "b" }
      assert(after.isEmpty,
        "a reused pool thread leaked the previous call's job group")
    } finally sc.clearJobGroup()
  }
}
