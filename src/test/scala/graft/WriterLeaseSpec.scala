package graft

import org.apache.hadoop.fs.{Path => HPath}
import graft.operators.WriterLease

/** The lease protocol's own contract, independent of any layout: the
  * pre-commit verify kills a stalled holder whose lease was legally
  * stolen, verify refreshes the heartbeat, release is owner-only, and
  * under a many-thread hammer the withLease critical section is
  * genuinely mutually exclusive.
  */
class WriterLeaseSpec extends SparkSpec {

  private def fs = new HPath("/").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  test("verify kills a stalled holder after a legal steal; release " +
      "is owner-only; verify refreshes the heartbeat") {
    withTempDir("graft-lease") { root =>
      val lp = new HPath(s"$root/_lock/lease")
      // holder A acquires, then stalls past the horizon
      val a = WriterLease.acquire(spark, root)
      fs.setTimes(lp, System.currentTimeMillis() - 7200000L, -1)
      // B legally steals the stale lease
      val b = WriterLease.acquire(spark, root)
      // A's pre-commit verify must now REFUSE — this is the
      // two-stealers/stalled-holder backstop: A never publishes
      val e = intercept[IllegalArgumentException] {
        WriterLease.verify(spark, a)
      }
      assert(e.getMessage.contains("was lost"), e.getMessage)
      // A's release must NOT delete B's lease (owner-only)
      WriterLease.release(spark, a)
      assert(fs.exists(lp), "a loser's release deleted the live lease")
      // B's verify succeeds and refreshes the heartbeat mtime
      fs.setTimes(lp, System.currentTimeMillis() - 600000L, -1)
      val before = fs.getFileStatus(lp).getModificationTime
      WriterLease.verify(spark, b)
      assert(fs.getFileStatus(lp).getModificationTime > before,
        "verify did not refresh the heartbeat")
      WriterLease.release(spark, b)
      assert(!fs.exists(lp))
    }
  }

  test("withLease is mutually exclusive under a many-thread hammer " +
      "and re-entrant on the owning thread") {
    withTempDir("graft-lease-mx") { root =>
      val inside = new java.util.concurrent.atomic.AtomicInteger(0)
      val maxSeen = new java.util.concurrent.atomic.AtomicInteger(0)
      val entered = new java.util.concurrent.atomic.AtomicInteger(0)
      val refused = new java.util.concurrent.atomic.AtomicInteger(0)
      val errs =
        new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val ts = (1 to 12).map(_ => new Thread(() =>
        for (_ <- 1 to 5) {
          try {
            WriterLease.withLease(spark, root) {
              val now = inside.incrementAndGet()
              maxSeen.accumulateAndGet(now, math.max)
              entered.incrementAndGet()
              // re-entrant on the SAME thread: no self-deadlock, no
              // second acquire
              WriterLease.withLease(spark, root) { () }
              Thread.sleep(1)
              inside.decrementAndGet()
            }
          } catch {
            case _: IllegalStateException => refused.incrementAndGet()
            case t: Throwable => errs.add(t)
          }
        }))
      ts.foreach(_.start()); ts.foreach(_.join())
      assert(errs.isEmpty, errs.toArray.mkString(", "))
      assert(maxSeen.get() === 1,
        s"two holders ran the critical section concurrently")
      // the hammer did real work on both sides of the contract
      assert(entered.get() >= 1 && refused.get() >= 1,
        s"entered=${entered.get()} refused=${refused.get()} — the " +
          "race never actually contended")
      // nothing leaked
      assert(!fs.exists(new HPath(s"$root/_lock/lease")))
    }
  }
}
