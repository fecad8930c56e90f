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
  */
object Par {
  /** Run `a` on a pool thread concurrently with `b` on the calling
    * thread; rethrows the first failure after both settle (waiting on
    * `a` even when `b` threw would deadlock nothing but would also
    * hide `b`'s error — `b`'s exception wins, `a` is awaited so its
    * jobs cannot leak past the call).
    */
  def both[A, B](a: => A)(b: => B): (A, B) = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future(a)
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
