package graft.operators

/** Overlap two INDEPENDENT Spark actions (guide: a driver that calls
  * actions sequentially leaves the cluster idle during each action's
  * driver-side phase — planning, collect deserialization, commit —
  * while the other action's tasks could be running; Spark's scheduler
  * happily runs jobs from several driver threads at once).
  *
  * The profile that motivates this: at bench scale the engine's wall
  * time is driver-bound, not task-bound (event-log audit r21: 100 s of
  * task time across 32 cores vs ~150 s wall — the cores are idle while
  * the driver plans/collects one action at a time). Two independent
  * trainings or two independent artifact writes overlap their driver
  * phases and their (small) jobs.
  *
  * Use ONLY for actions with no data or ordering dependency — and
  * never for two MUTATING actions on a path a crash contract orders
  * (the kill-sweep specs count mutating filesystem ops; concurrent
  * mutations would make that sequence nondeterministic). Reads and
  * driver-side training collects are always safe; paired writes are
  * safe when both are staging/overwrite targets keyed by the same
  * version and a crash between them already converges by re-run.
  *
  * Threading (r21 advice): the pool side runs on a DEDICATED named
  * cached pool, not `ExecutionContext.global` — Spark actions BLOCK
  * their thread for seconds (collect waits, commit waits), and the
  * global pool is a bounded fork-join pool shared with anything else
  * in the JVM, so nested sites (a gate init whose build overlaps its
  * own trainings) could starve it. A cached daemon pool grows with
  * concurrently blocked actions and shrinks to zero when idle. The
  * caller's Spark LOCAL PROPERTIES (job group, description,
  * interrupt-on-cancel, scheduler pool) are copied onto the pool
  * thread for the closure's duration, so the overlapped action keeps
  * the caller's UI attribution and — load-bearing — its CANCELLATION
  * scope: cancelling the caller's job group now cancels the
  * overlapped write too, instead of leaving it mutating after the
  * caller's side died. Also load-bearing: WriterLease tracks held
  * leases PER THREAD, so lease-fenced work must stay on the CALLING
  * side of a `both` (the fences inside it would silently no-op on a
  * pool thread) — every current site does.
  */
object Par {
  private val pool = java.util.concurrent.Executors.newCachedThreadPool(
    new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger(0)
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-par-${n.incrementAndGet()}")
        t.setDaemon(true) // overlap helpers must never hold the JVM open
        t
      }
    })

  /** The caller-attribution properties worth carrying across the
    * thread hop. NOT `spark.sql.execution.id`: each action must open
    * its own SQL execution (copying the caller's would nest two
    * concurrent physical plans under one execution — the UI lies and
    * Spark asserts on it).
    */
  private val CarriedProps = Seq("spark.jobGroup.id",
    "spark.job.description", "spark.job.interruptOnCancel",
    "spark.scheduler.pool")

  /** Run `a` on a pool thread concurrently with `b` on the calling
    * thread; rethrows the first failure after both settle (waiting on
    * `a` even when `b` threw would deadlock nothing but would also
    * hide `b`'s error — `b`'s exception wins, `a` is awaited so its
    * jobs cannot leak past the call).
    */
  def both[A, B](a: => A)(b: => B): (A, B) = {
    import scala.concurrent.{Await, Promise}
    import scala.concurrent.duration.Duration
    val sc = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext)
    val carried = sc.toSeq.flatMap(c =>
      CarriedProps.map(k => k -> c.getLocalProperty(k)))
    val pa = Promise[A]()
    pool.execute { () =>
      // set BEFORE, clear AFTER: cached-pool threads are reused, and a
      // stale job group would mislabel (and mis-cancel) a later call
      sc.foreach(c => carried.foreach { case (k, v) =>
        c.setLocalProperty(k, v) })
      try pa.success(a)
      catch { case t: Throwable => pa.failure(t) }
      finally sc.foreach(c => carried.foreach { case (k, _) =>
        c.setLocalProperty(k, null) })
    }
    val fa = pa.future
    val rb =
      try b
      catch { case t: Throwable =>
        // b failed: still settle a (suppressed) so no job outlives us
        try Await.ready(fa, Duration.Inf) catch { case _: Throwable => () }
        throw t
      }
    (Await.result(fa, Duration.Inf), rb)
  }
}
