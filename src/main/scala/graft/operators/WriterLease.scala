package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Cross-process writer LEASE — serializes single-writer mutators per
  * root, shared by the versioned CDC layout ([[PartitionedCdc]]) and
  * the index artifacts ([[DedupIndex]]/[[VectorIndex]] batch
  * mutators). Detection layers (the manifest fence, the append digest
  * guard) remain each layout's correctness backstop; the lease moves
  * a second writer's failure EARLIER — before it stages or overwrites
  * a byte.
  *
  * Protocol (create-exclusive file + mtime heartbeat + staleness
  * steal):
  *  - acquire: write a UUID token to a private tmp and rename it to
  *    `root/_lock/lease` with NO overwrite — the same atomic decision
  *    point as a manifest commit. A fresh existing lease fails the
  *    acquire loudly.
  *  - heartbeat: [[verify]] (and its [[verifyHeld]] wrapper, which
  *    every artifact/CDC mutator calls at stage boundaries and
  *    pre-commit points) touches the lease's mtime AND replaces a
  *    content heartbeat file (`_lock/heartbeat`, `token\nmillis`) —
  *    the latter because object stores no-op `setTimes`, which would
  *    silently shorten the horizon to time-since-acquire there. A
  *    lease is stealable only once the FRESHEST of its mtime and a
  *    token-matching content heartbeat is older than
  *    `graft.lease.stealHorizonMs` (default 15 min;
  *    `graft.cdc.leaseStealHorizonMs` is honored as the legacy
  *    spelling) — i.e. the holder made no progress for the whole
  *    horizon (crashed JVM, lost executor). Stealing renames the
  *    observed stale file aside (of two racing stealers exactly one
  *    rename of the same path succeeds) and re-runs the exclusive
  *    create.
  *  - verify: holders RE-READ the lease and require their own token
  *    immediately before their commit point. A holder that stalled
  *    past the horizon and lost its lease dies BEFORE publishing —
  *    the steal/verify pair closes the classic two-stealers window
  *    without filesystem compare-and-swap (worst case both believe
  *    they acquired; only the one whose token is in the file passes
  *    verify, the other's staging self-deletes like any fenced-out
  *    loser's).
  *  - release: owner-only (delete only if the content is still our
  *    token) — lease file first, then a TOKEN-MATCHED heartbeat
  *    sweep, so neither a mid-release stealer (possible on
  *    setTimes-no-op stores, where a healthy holder's mtime may
  *    already be past the horizon) nor a rival acquirer of the
  *    freed lease has its files removed.
  *
  * SAME-JVM lease ops serialize on a per-path in-process lock: the
  * local filesystem's no-overwrite rename is check-then-rename (POSIX
  * rename(2) overwrites) and its (file, .crc) pair moves
  * non-atomically — two same-JVM racers could otherwise both "win"
  * the create and interleave the checksum. Cross-process racers never
  * share the lock and are decided by the no-overwrite rename, which
  * HDFS-like stores make atomic (stores without one need an external
  * lock — see CLUSTER.md).
  *
  * Held leases are tracked PER THREAD: [[withLease]] is re-entrant on
  * the acquiring thread (an outer mutator that delegates to another
  * wrapped mutator keeps one lease), while a second same-JVM thread
  * conflicts exactly like a second process. Long-running owners whose
  * work hops threads (Structured Streaming's foreachBatch) acquire
  * once on the driver thread and transfer ownership per batch via
  * [[asOwner]] — the streaming index gates hold their artifact's
  * lease for the whole replay this way, so a concurrent batch
  * mutator on the same root refuses at entry even while a stream
  * owns it (and a crashed stream's lease is stolen past the horizon
  * like any other holder's).
  */
object WriterLease {

  final case class Lease(path: Path, token: String)

  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def lockOf(fs: FileSystem, lp: Path): Object =
    locks.computeIfAbsent(fs.makeQualified(lp).toString,
      _ => new Object)

  private def leasePath(root: String) = new Path(root, "_lock/lease")

  private def fsOf(s: SparkSession, p: Path): FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  private def stealHorizonMs(s: SparkSession): Long =
    if (s.conf.getOption("graft.lease.stealHorizonMs").isDefined)
      Knobs.long(s, "graft.lease.stealHorizonMs", 900000L, min = 1)
    else
      Knobs.long(s, "graft.cdc.leaseStealHorizonMs", 900000L, min = 1)

  private def tokenOf(fs: FileSystem, lp: Path): Option[String] =
    try {
      val in = fs.open(lp)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    } catch { case _: java.io.FileNotFoundException => None }

  // ---- content heartbeat ------------------------------------------------
  // The mtime heartbeat (verify's setTimes) is a NO-OP on object
  // stores (S3A and friends ignore setTimes), which silently
  // shortened the steal horizon to time-since-ACQUIRE there: a live
  // holder whose mutation outruns the horizon would be stolen
  // mid-write. The content heartbeat closes it without touching the
  // lease file (an in-place rewrite would open a no-lease window an
  // acquirer could win): verify ALSO replaces `_lock/heartbeat` with
  // `token\nholderClockMillis`, and the staleness check takes the
  // freshest of the lease mtime and a TOKEN-MATCHING content
  // heartbeat. A stale heartbeat left behind by a stolen holder can
  // never shield the next lease: its token no longer matches.
  // Clocks: the heartbeat carries the HOLDER's clock and the stealer
  // compares against its own — skew shifts the effective horizon by
  // at most the skew, the same exposure the mtime path already had
  // to the namenode clock (size the horizon >> plausible skew).

  private def heartbeatPath(lp: Path) = new Path(lp.getParent, "heartbeat")

  private def writeHeartbeat(fs: FileSystem, lp: Path,
      token: String): Unit = {
    val hb = heartbeatPath(lp)
    val tmp = new Path(lp.getParent, s".hb.$token")
    val out = fs.create(tmp, true)
    try out.write((token + "\n" + System.currentTimeMillis())
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // POSIX rename replaces atomically; HDFS-like stores refuse an
    // existing dst -> delete-then-rename, whose brief absence window
    // only DEGRADES staleness to the (older) lease mtime, never
    // extends the lease
    val renamed = try fs.rename(tmp, hb)
      catch { case _: java.io.IOException => false }
    if (!renamed || fs.exists(tmp)) {
      try {
        fs.delete(hb, false)
        if (!fs.rename(tmp, hb)) fs.delete(tmp, false)
      } catch { case _: java.io.IOException =>
        try fs.delete(tmp, false)
        catch { case _: java.io.IOException => () }
      }
    }
  }

  /** Sweep the heartbeat ONLY if it still belongs to `token` — the
    * steal/release sweep guard: once the lease path is free (renamed
    * aside, or deleted), a cross-process acquirer can win it and
    * verify-write a FRESH heartbeat at any moment, and an
    * unconditional delete here would sweep that, transiently
    * degrading the new holder's staleness to acquire-time mtime on
    * setTimes-no-op stores until its next verify. The token check
    * makes the sweep owner-scoped; the read-then-delete window that
    * remains can only DROP a heartbeat the next verify rewrites —
    * staleness degrades toward stealing sooner, never extends a
    * lease.
    */
  private def sweepHeartbeatOf(fs: FileSystem, lp: Path,
      token: Option[String]): Unit =
    try {
      val in = fs.open(heartbeatPath(lp))
      val txt = try scala.io.Source
        .fromInputStream(in, "UTF-8").mkString finally in.close()
      if (token.contains(txt.split("\n", 2)(0)))
        fs.delete(heartbeatPath(lp), false)
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Milliseconds since the holder's last observable progress: the
    * freshest of the lease file's mtime and a token-matching content
    * heartbeat (absent/garbled/foreign heartbeats are ignored — they
    * can only belong to a previous lease).
    */
  private def heartbeatAgeMs(fs: FileSystem, lp: Path,
      leaseToken: Option[String], leaseMtime: Long): Long = {
    val hbMillis = try {
      val in = fs.open(heartbeatPath(lp))
      val txt = try scala.io.Source
        .fromInputStream(in, "UTF-8").mkString finally in.close()
      val lines = txt.split("\n", 2)
      if (lines.length == 2 && leaseToken.contains(lines(0)))
        Some(lines(1).trim.toLong)
      else None
    } catch { case scala.util.control.NonFatal(_) => None }
    System.currentTimeMillis() -
      math.max(leaseMtime, hbMillis.getOrElse(Long.MinValue))
  }

  def acquire(s: SparkSession, root: String): Lease = {
    val lp = leasePath(root)
    val fs = fsOf(s, lp)
    fs.mkdirs(lp.getParent)
    val token = java.util.UUID.randomUUID.toString
    lockOf(fs, lp).synchronized {
      def tryCreate(): Boolean = {
        // FileSystem.rename, NOT FileContext: with the native-hadoop
        // lib absent, every FileContext rename stats src and dst
        // through a forked `ls` (measured 14-27 ms/op vs 0.08 ms for
        // fs.rename — 43 ms per acquire/release cycle, paid per
        // micro-batch). Semantics are unchanged where they exist:
        // HDFS-like stores refuse an existing dst (rename = false →
        // the loser path below); the local filesystem's POSIX rename
        // would overwrite, so the exists pre-check restores the same
        // check-then-rename window FileContext's local form had — the
        // same-JVM lock prevents it in-process, and the read-back in
        // acquired() catches the cross-process residue.
        if (fs.exists(lp)) return false
        val tmp = new Path(lp.getParent, s".tmp.$token")
        val out = fs.create(tmp, true)
        try out.write(
          token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        val renamed = try fs.rename(tmp, lp)
          catch { case _: java.io.IOException => false }
        if (!renamed || fs.exists(tmp)) {
          fs.delete(tmp, false); false
        } else true
      }
      def acquired(): Lease = {
        // read-back verification narrows the two-stealers window at
        // the earliest point (the pre-commit verify is the backstop)
        require(tokenOf(fs, lp).contains(token),
          s"WriterLease: lease on $root was taken over immediately " +
            "after acquisition (two writers stealing the same stale " +
            "lease) — re-run this batch")
        Lease(lp, token)
      }
      if (tryCreate()) return acquired()
      val horizon = stealHorizonMs(s)
      val st = try Some(fs.getFileStatus(lp))
        catch { case _: java.io.FileNotFoundException => None }
      val deadToken = tokenOf(fs, lp)
      val ageMs = st.map(x => heartbeatAgeMs(fs, lp,
        deadToken, x.getModificationTime))
      if (ageMs.forall(_ > horizon)) {
        // stale (or vanished between the failed create and the
        // stat): move the dead holder's file aside, then race the
        // exclusive create again. The dead holder's heartbeat file
        // is an orphan now (its token matches nothing) — sweep it,
        // TOKEN-MATCHED: the instant the rename frees the lease path
        // a rival acquirer can win it and heartbeat, and an
        // unconditional delete would sweep that fresh heartbeat.
        if (st.isDefined) {
          val aside = new Path(lp.getParent, s".stale.$token")
          if (fs.rename(lp, aside)) {
            fs.delete(aside, false)
            sweepHeartbeatOf(fs, lp, deadToken)
          }
        }
        if (tryCreate()) return acquired()
      }
      throw new IllegalStateException(
        s"WriterLease: another writer holds the lease on $root" +
          ageMs.map(a => s" (last heartbeat ${a} ms ago, steal " +
            s"horizon ${horizon} ms — graft.lease.stealHorizonMs)")
            .getOrElse("") +
          "; the layout is single-writer per root — wait for the " +
          "holder to finish, or raise/lower the steal horizon if it " +
          "crashed")
    }
  }

  /** Re-read the lease and require our own token, then refresh the
    * heartbeat — the pre-commit check: a holder that stalled past the
    * steal horizon and lost the lease dies HERE, before publishing.
    */
  def verify(s: SparkSession, lease: Lease): Unit = {
    val fs = fsOf(s, lease.path)
    lockOf(fs, lease.path).synchronized {
      require(tokenOf(fs, lease.path).contains(lease.token),
        s"WriterLease: writer lease ${lease.path} was lost — this " +
          "writer made no progress for longer than " +
          "graft.lease.stealHorizonMs and another writer stole the " +
          "lease; abandoning before the commit (re-run the batch)")
      // both heartbeats: mtime where the store honors setTimes, the
      // content file everywhere else (object stores no-op setTimes —
      // see the content-heartbeat block above)
      try fs.setTimes(lease.path, System.currentTimeMillis(), -1)
      catch { case _: java.io.IOException => () }
      writeHeartbeat(fs, lease.path, lease.token)
    }
  }

  def release(s: SparkSession, lease: Lease): Unit = {
    val fs = fsOf(s, lease.path)
    lockOf(fs, lease.path).synchronized {
      if (tokenOf(fs, lease.path).contains(lease.token)) {
        // lease file FIRST, then a TOKEN-MATCHED heartbeat sweep.
        // Heartbeat-first is wrong on setTimes-no-op stores: a
        // healthy holder whose lease MTIME is past the horizon
        // (freshness carried only by the content heartbeat) would
        // manufacture its own staleness mid-release — a rival
        // observing the gap (no heartbeat, stale mtime) legally
        // steals, and our subsequent lease delete would remove the
        // RIVAL's fresh lease. Unconditional heartbeat-delete after
        // the lease delete is also wrong (it sweeps the heartbeat a
        // rival acquirer of the freed lease just verify-wrote) —
        // the token match scopes the sweep to our own.
        fs.delete(lease.path, false)
        sweepHeartbeatOf(fs, lease.path, Some(lease.token))
        // sweep the now-empty containers (the `_lock` dir, and for
        // SIBLING lock roots the `<dir>__lock` dir itself) so
        // short-lived roots — temp artifacts, spec dirs — don't leak
        // one empty tree per lease. NON-recursive: a concurrent
        // acquirer whose parent vanished under it re-creates the
        // path (FileSystem.create makes parents) and at worst loops
        // once through the vanished-lease steal branch. The
        // grandparent is swept ONLY when it is a sibling lock root
        // (the `__lock` artifact convention): for in-root leases
        // (`root/_lock/lease`, the CDC convention) the grandparent
        // IS the caller's data root, and on a not-yet-initialized
        // root — a legal acquire/release pairing — it is empty, so
        // the old unconditional delete removed the root itself.
        try {
          fs.delete(lease.path.getParent, false)
          val gp = lease.path.getParent.getParent
          if (gp != null && gp.getName.endsWith("__lock"))
            fs.delete(gp, false)
        } catch { case _: java.io.IOException => () }
      }
    }
  }

  private val held = new ThreadLocal[Map[String, Lease]] {
    override def initialValue(): Map[String, Lease] = Map.empty
  }

  private def keyOf(s: SparkSession, root: String): String =
    fsOf(s, new Path(root)).makeQualified(new Path(root)).toString

  /** The lease a mutator on this thread currently holds for `root`,
    * if any — consulted at commit points for the pre-commit verify.
    */
  def heldFor(s: SparkSession, root: String): Option[Lease] =
    held.get.get(keyOf(s, root))

  /** Pre-commit fence + heartbeat for wrapped mutators: verify (and
    * mtime-refresh) the lease this thread holds for `root`; a no-op
    * when none is held (the streaming gates' run-private roots rely
    * on checkpoint serialization instead). Mutators call this
    * immediately BEFORE each destructive write/overwrite/swap and
    * AFTER each long stage (quantizer training, a full-corpus
    * encode), so a holder that stalled past the steal horizon dies
    * before publishing a byte — and a live holder whose work runs
    * longer than the horizon keeps its heartbeat moving at every
    * stage boundary, making a legal steal of a progressing writer
    * proportionally unlikely. This is the same fence
    * [[PartitionedCdc]] runs before its manifest commit; it also
    * closes the local-filesystem acquire race (POSIX rename
    * overwrites, so two cross-process acquirers can transiently both
    * believe they won): only the token in the file passes the fence.
    */
  def verifyHeld(s: SparkSession, root: String): Unit =
    heldFor(s, root).foreach(verify(s, _))

  /** Run `f` on the CURRENT thread as the owner of an
    * already-acquired lease — the ownership-transfer hook for
    * long-running holders whose work hops threads (a streaming
    * query's foreachBatch body runs on the stream's thread, not the
    * acquiring driver thread). The holder acquires once on the driver
    * thread and wraps each micro-batch body (and any driver-side
    * setup/maintenance) in asOwner: wrapped mutators' [[withLease]]
    * then re-enters instead of refusing, and their [[verifyHeld]]
    * fences heartbeat the stream's lease from whichever thread runs
    * the batch. The entry [[verify]] doubles as the per-batch
    * heartbeat AND the stolen-lease fence: a stream stalled past the
    * steal horizon dies at its next batch boundary, before mutating.
    * The caller guarantees the single-threaded handoff (foreachBatch
    * bodies run serially); threads NOT given the lease still conflict
    * exactly like a second process — which is the enforcement a
    * shared-root stream adds over run-private checkpoint
    * serialization.
    */
  def asOwner[A](s: SparkSession, root: String, lease: Lease)(
      f: => A): A = {
    val key = keyOf(s, root)
    verify(s, lease)
    val prev = held.get.get(key)
    held.set(held.get + (key -> lease))
    try f
    finally held.set(prev.fold(held.get - key)(p =>
      held.get + (key -> p)))
  }

  /** Acquire → run → release, re-entrant per thread: the outermost
    * wrapped call owns the lease; nested wrapped calls on the same
    * root run under it.
    */
  def withLease[A](s: SparkSession, root: String)(f: => A): A = {
    val key = keyOf(s, root)
    if (held.get.contains(key)) f
    else {
      val lease = acquire(s, root)
      held.set(held.get + (key -> lease))
      try f finally {
        held.set(held.get - key)
        release(s, lease)
      }
    }
  }
}
