package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog application — the incremental-maintenance staple for a
  * 100 TB snapshot (the reference's insert/update/delete surface, §2.12,
  * generalized to the batch-CDC shape every lakehouse MERGE runs):
  * given a base snapshot and a keyed changelog of (op, seq, payload)
  * rows, produce the next snapshot. Latest-wins per key by `seqCol`;
  * a delete op drops the key; any other op upserts its payload.
  *
  * Scale shape: the changelog collapses with ONE aggregation
  * (`max_by` of the payload struct over seq). A string-bearing
  * payload buffer rules out HashAggregate, so the plan is a
  * SortAggregate pair — but the PARTIAL aggregate still collapses
  * keys map-side, so the exchange carries ~one row per key; a window
  * `row_number` would instead shuffle AND sort every change row
  * (plan-audited in PLANS.md). The base then joins the collapsed
  * keys once (left-anti; at cluster scale both sides bucket by the
  * key, making the join zero-exchange).
  *
  * ==Maintenance strategy decision table==
  *
  * Which maintenance path to run for a materialized aggregate, by
  * churn ratio (changelog keys / base rows), base layout, and
  * aggregate class (ScaleProbe rows: 20M base / 2M log / 1k groups,
  * local[32] — `mv maintain` 5.8 s unbucketed vs 3.5 s bucketed,
  * `mv recompute` ≈ maintain-unbucketed at this ratio but scales with
  * the BASE, not the churn):
  *
  * | churn | base bucketed by key? | aggregate class | run |
  * |---|---|---|---|
  * | any | — | sum / count / avg (subtractable) | [[maintainAggs]] — churn-sized: the base is touched only by the churn-keyed semi-join |
  * | ≲5% | yes | min / max / distinct / percentile | [[maintainByRecompute]] — touched-group-sized; the group-key-partitioned snapshot prunes the re-aggregation read |
  * | ≲5% | no | min / max / distinct / percentile | [[maintainByRecompute]] still, IF touched groups ≪ all groups; the base probe pays one shuffle — at high base:churn ratios bucket the base first (measured 1.7× on the probe, and the gap grows with base size) |
  * | ≳20–30% | — | any | full recompute (`aggFn(applyChangelog(…))`) — at that churn the maintained path's semi-join + merge approaches the recompute's single pass, without its simplicity |
  * | — | — | non-decomposable over the whole table (exact global median) | full recompute — group pruning has no group to prune |
  *
  * The crossover is measured-not-guessed territory: locally the
  * 1k-group narrow view hides the gap under the shared base read
  * (within noise), the 100k-string-group 4-sum view shows it, and
  * bucketing the base moves maintainAggs from parity to a clear win.
  * At cluster scale the base:churn ratio is 10³–10⁵, not 10 — every
  * row of the table tilts further toward the maintained paths.
  */
object CdcOps {

  /** Apply `log` to `base`. `base`'s columns must equal `log`'s minus
    * (`seqCol`, `opCol`) — i.e. the key plus the payload; the caller
    * maps both inputs to that common shape. Ties on `seqCol` within a
    * key are the caller's contract to avoid (upstream CDC sequence
    * numbers are unique per key by construction).
    */
  def applyChangelog(base: DataFrame, log: DataFrame, keys: Seq[String],
      seqCol: String, opCol: String, deleteOp: String = "D"): DataFrame = {
    val payload = logPayload(log, keys, seqCol)
    require((keys ++ payload).filterNot(_ == opCol).toSet ==
      base.columns.toSet,
      s"base columns ${base.columns.toSeq} must be keys $keys + " +
        s"changelog payload ${payload.filterNot(_ == opCol)}")
    val latest = collapseLatest(log, keys, seqCol, payload)
    applyCollapsed(base, latest, keys, opCol, deleteOp)
  }

  /** [[applyChangelog]] body over an ALREADY-collapsed changelog (one
    * row per key) — shared so ops that need the collapse themselves
    * ([[maintainByRecompute]]) never pay the max_by aggregation twice.
    */
  private def applyCollapsed(base: DataFrame, latest: DataFrame,
      keys: Seq[String], opCol: String, deleteOp: String): DataFrame = {
    // shuffle-hash build on the collapsed keys: the base (the 100 TB
    // side) must never be SORTED for this join — SMJ would sort every
    // snapshot partition to anti-join a key set bounded by the
    // changelog's churn (ScaleProbe, 20M base + 2M log: 54 s SMJ →
    // 7.7 s SHJ). At cluster scale both sides bucket by the key
    // instead.
    val untouched = base.join(
      latest.select(keys.map(col): _*).hint("shuffle_hash"),
      keys, "left_anti")
    untouched.unionByName(
      latest.filter(notDeleted(opCol, deleteOp)).drop(opCol))
  }

  /** One row per key: latest-wins collapse of the changelog by `seqCol`
    * — ONE `max_by` aggregation whose PARTIAL stage collapses keys
    * map-side, so the exchange carries ~one row per key (a window
    * `row_number` would shuffle AND sort every change row).
    */
  private def collapseLatest(log: DataFrame, keys: Seq[String],
      seqCol: String, payload: Seq[String]): DataFrame =
    log.groupBy(keys.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*), col(seqCol)).as("__c"))
      .select(keys.map(col) ++ payload.map(p => col(s"__c.$p")): _*)

  private def logPayload(log: DataFrame, keys: Seq[String],
      seqCol: String): Seq[String] =
    log.columns.toSeq.filterNot(c => keys.contains(c) || c == seqCol)

  /** op is NOT NULL by contract: a null op would make the `=!=`
    * predicate NULL and silently drop the row as if deleted — fail
    * loudly at the first null instead (raise_error costs nothing on
    * the happy path, unlike a validation count's extra pass).
    */
  private def notDeleted(opCol: String, deleteOp: String) =
    when(col(opCol).isNull,
      raise_error(lit("CdcOps: null op in changelog — every change row " +
        "must carry a non-null op code")).cast("boolean"))
      .otherwise(col(opCol) =!= deleteOp)

  /** INCREMENTAL MAINTENANCE of a grouped aggregate under a changelog
    * — the materialized-view delta update: given the previous
    * aggregate (`prevAgg`: one row per `dims` group carrying each
    * `sumCols` sum and a `cntCol` row count), the previous base
    * snapshot, and the keyed changelog, produce the aggregate of the
    * NEXT snapshot without re-aggregating the base.
    *
    * Sums and counts are the incrementally-maintainable aggregates
    * (algebraic and subtraction-invertible); avg/ratio views derive
    * from them at read time. Exactness of `sum` maintenance is the
    * caller's contract — pass integer-scaled measures when the result
    * must equal a recompute bit-for-bit (float addition is not
    * associative).
    *
    * Scale shape — the whole point of the op: the 100 TB base is
    * touched ONLY by a semi-join against the changelog's collapsed
    * key set (churn-sized; with both sides bucketed by key the probe
    * reads just the touched buckets — never sorted, same
    * `shuffle_hash` contract as [[applyChangelog]]). Everything else
    * is churn- or group-cardinality-sized: removed contributions
    * (the touched keys' OLD rows, negated) union added contributions
    * (the surviving latest payloads) union the previous aggregate's
    * rows and collapse per group in ONE summing aggregation — the
    * partial stage collapses map-side, group-count rows cross the
    * exchange, and a NULL group key merges correctly (grouping
    * treats null as a group; a join-based merge would split it — the
    * same null-safety reasoning as [[snapshotDiff]]'s formulation).
    * A group whose count reaches zero is dropped (it no longer
    * exists in the view); a group first seen in the delta is born
    * with its contributions alone.
    *
    * Equivalence contract (the x12 oracle): maintainAggs(agg(base))
    * ≡ agg(applyChangelog(base, log)) for the same keys/seq/op.
    */
  def maintainAggs(prevAgg: DataFrame, base: DataFrame, log: DataFrame,
      keys: Seq[String], seqCol: String, opCol: String,
      dims: Seq[String], sumCols: Seq[String], cntCol: String = "n",
      deleteOp: String = "D"): DataFrame = {
    val payload = logPayload(log, keys, seqCol)
    require(prevAgg.columns.toSet == (dims ++ sumCols :+ cntCol).toSet,
      s"prevAgg columns ${prevAgg.columns.toSeq} must be dims $dims + " +
        s"sums $sumCols + count $cntCol")
    val latest = collapseLatest(log, keys, seqCol, payload)
    val touched = latest.select(keys.map(col): _*)
    // the ONLY read of the base: old contributions of touched keys,
    // negated. Churn-sized output; bucketed-by-key base at cluster
    // scale makes this a pruned probe, not a scan.
    val removed = base
      .join(touched.hint("shuffle_hash"), keys, "left_semi")
      .select(dims.map(col) ++ sumCols.map(c => (-col(c)).as(c))
        :+ lit(-1L).as(cntCol): _*)
    val added = latest.filter(notDeleted(opCol, deleteOp))
      .select(dims.map(col) ++ sumCols.map(col)
        :+ lit(1L).as(cntCol): _*)
    val merged = (sumCols :+ cntCol).map(c => sum(col(c)).as(c))
    prevAgg.select(dims.map(col) ++ (sumCols :+ cntCol).map(col): _*)
      .unionByName(removed).unionByName(added)
      .groupBy(dims.map(col): _*)
      .agg(merged.head, merged.tail: _*)
      .filter(col(cntCol) > 0)
  }

  /** GROUP-PRUNED RECOMPUTE maintenance — the honest strategy for
    * aggregates that subtraction can NOT maintain (min/max, exact
    * distinct counts, percentiles): a delete may remove the current
    * extreme, so the touched group must genuinely re-aggregate. The
    * pruning insight is that only groups the changelog TOUCHES can
    * change: the touched-group set is (old groups of touched keys —
    * from a churn-keyed semi-join of the base) ∪ (new groups in the
    * surviving payloads), a group-cardinality-bounded frame. Every
    * untouched group carries over from `prevAgg` by an anti-join
    * (never re-aggregated, never even read from the base); only the
    * next snapshot's rows in touched groups — `applyChangelog`
    * output semi-joined to the touched groups, a partition-pruned
    * read when the snapshot is stored partitioned/bucketed by the
    * group key — flow through the caller's aggregation.
    *
    * `aggFn(rows)` computes the per-`dims` aggregate of a snapshot
    * slice — the SAME definition that produced `prevAgg`, so
    * maintainByRecompute(aggFn(base), …) ≡ aggFn(apply(base, log))
    * (the x14 oracle). Complements [[maintainAggs]]: use that for
    * sums/counts (churn-sized work), this for everything else
    * (touched-group-sized work).
    */
  def maintainByRecompute(prevAgg: DataFrame, base: DataFrame,
      log: DataFrame, keys: Seq[String], seqCol: String, opCol: String,
      dims: Seq[String], aggFn: DataFrame => DataFrame,
      deleteOp: String = "D"): DataFrame = {
    val payload = logPayload(log, keys, seqCol)
    val latest = collapseLatest(log, keys, seqCol, payload)
    val touched = latest.select(keys.map(col): _*)
    val oldGroups = base
      .join(touched.hint("shuffle_hash"), keys, "left_semi")
      .select(dims.map(col): _*)
    val newGroups = latest.filter(notDeleted(opCol, deleteOp))
      .select(dims.map(col): _*)
    val touchedGroups = oldGroups.unionByName(newGroups).distinct()
    val next = applyCollapsed(base, latest, keys, opCol, deleteOp)
    // the group joins must be NULL-SAFE: a null group key is a real
    // group (aggFn's groupBy treats it as one), but an equality join
    // never matches null — the null group would neither re-aggregate
    // nor be evicted from the carried previous view. Renamed right
    // side + <=> conditions (renaming also severs attribute lineage
    // shared through `latest`/`base` on both sides of the join).
    val tg = touchedGroups.select(dims.map(d =>
      col(d).as(s"__tg_$d")): _*).hint("shuffle_hash")
    def nullSafeOn(left: DataFrame) = dims.map(d =>
      left(d) <=> tg(s"__tg_$d")).reduce(_ && _)
    val recomputed = aggFn(next.join(tg, nullSafeOn(next), "left_semi"))
    val carried = prevAgg.join(tg, nullSafeOn(prevAgg), "left_anti")
    carried.unionByName(recomputed)
  }

  /** Versions of a `prefix`-chained artifact present under `root`
    * (snapshots as `snap0..snapN`, aggregates as `agg0..aggN`) — ONE
    * driver-side directory listing, never a data read. Sorted
    * ascending; subject to the writer's retention window.
    */
  def listVersions(ss: org.apache.spark.sql.SparkSession, root: String,
      prefix: String = "snap"): Seq[Int] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(ss.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(prefix))
      .flatMap(n => n.drop(prefix.length).toIntOption)
      .sorted
  }

  /** TIME-TRAVEL READ: version `v` of a chained artifact — the
    * snapshot after micro-batch v-1 committed (v = 0 is the seeded
    * base). Fails with the available window rather than a bare
    * missing-path error when `v` has been retention-pruned; pair
    * with [[snapshotDiff]] for an audit of what any version range
    * changed.
    */
  def readVersion(ss: org.apache.spark.sql.SparkSession, root: String,
      v: Int, prefix: String = "snap"): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$root/$prefix$v")
    val fs = p.getFileSystem(ss.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      val have = listVersions(ss, root, prefix)
      throw new IllegalArgumentException(
        s"readVersion: $prefix$v not present under $root — " +
          (if (have.isEmpty) "no versions exist"
           else s"retained versions: ${have.mkString(", ")}") +
          " (older versions fall off the writer's retention window)")
    }
    ss.read.parquet(p.toString)
  }

  /** Audit diff of two snapshot versions sharing a schema — what a
    * changelog batch (or a time-travel window) DID to the table:
    * per key, `change` = 'A' (present only in `next`), 'R' (present
    * only in `prev`), or 'C' (present in both with any payload column
    * differing, null-safely); identical rows are not emitted. Output
    * carries `old_<c>`/`new_<c>` for every payload column (null on
    * the absent side).
    *
    * NOT a join: the two versions union with a side tag and collapse
    * in ONE keyed aggregation (`max` over a side-filtered payload
    * struct — each key appears at most once per side, so `max` just
    * selects the present struct, and the PARTIAL aggregate collapses
    * pairs map-side). One exchange total, versus a full-outer join's
    * two — and it sidesteps a planner hazard: when `next`
    * structurally CONTAINS `prev` (the natural successive-version
    * composition, next = applyChangelog(prev, log)), both join
    * inputs are Unions of same-partitioned legs, and this Spark
    * build plans the join directly over the Unions, whose RDDs carry
    * the SUM of their children's partitions — the join's zip then
    * fails with "Can't zip RDDs with unequal numbers of partitions".
    * An aggregation has no second leg to zip.
    */
  def snapshotDiff(prev: DataFrame, next: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(prev.columns.toSet == next.columns.toSet,
      s"snapshotDiff: schemas differ — ${prev.columns.toSeq} vs " +
        s"${next.columns.toSeq}")
    val payload = prev.columns.toSeq.filterNot(keys.contains)
    def side(df: DataFrame, tag: String) =
      df.select(keys.map(col) ++ payload.map(col)
        :+ lit(tag).as("__side"): _*)
    side(prev, "p").unionByName(side(next, "n"))
      .groupBy(keys.map(col): _*)
      .agg(
        max(when(col("__side") === "p",
          struct(payload.map(col): _*))).as("__old"),
        max(when(col("__side") === "n",
          struct(payload.map(col): _*))).as("__new"))
      .withColumn("change",
        when(col("__old").isNull, lit("A"))
          .when(col("__new").isNull, lit("R"))
          .when(!(col("__old") <=> col("__new")), lit("C")))
      .filter(col("change").isNotNull)
      .select(keys.map(col) ++ Seq(col("change"))
        ++ payload.flatMap(c => Seq(col(s"__old.$c").as(s"old_$c"),
          col(s"__new.$c").as(s"new_$c"))): _*)
  }

  /** The DELETE-ONLY special case of [[applyChangelog]]: a tombstone
    * set (keys only — no payload, no sequencing: deletion is
    * idempotent and order-free) applied as one anti-join. Same scale
    * contract as the full apply: the base side is never sorted
    * (`shuffle_hash` build on the collapsed key set; at cluster scale
    * both sides bucket by the key), and the tombstone side collapses
    * to distinct keys first so a noisy takedown feed (the same id
    * listed many times) costs one row per key in the build. This is
    * the collapse the index artifacts' takedown path
    * ([[VectorIndex.delete]] / [[DedupIndex.delete]]) runs over the
    * affected partitions.
    *
    * `broadcastTombs = true` switches the anti-join build side to a
    * broadcast: with a takedown-feed-sized tombstone set the join
    * becomes MAP-ONLY — the base rows are never exchanged — which is
    * what the partition-pruned delete wants (its survivors are wide
    * index rows; shuffling them would dominate the rewrite). Leave
    * false when the tombstone set may exceed broadcast budgets (the
    * general CDC case): both sides then shuffle by key, base side
    * hash-built, still never sorted.
    */
  def applyTombstones(base: DataFrame, tombs: DataFrame,
      keys: Seq[String], broadcastTombs: Boolean = false): DataFrame = {
    val t = tombs.select(keys.map(col): _*).distinct()
    base.join(
      if (broadcastTombs) broadcast(t) else t.hint("shuffle_hash"),
      keys, "left_anti")
  }

  /** CONTINUOUS changelog application: the stream maintains a
    * VERSIONED parquet snapshot (`snap0` = base, `snapN` after batch
    * N — each micro-batch reads the previous version and writes the
    * next, never overwriting what it reads: the lakehouse
    * snapshot-isolation shape). The changelog replays as `nFiles`
    * seq-ordered micro-batches; because latest-wins COMPOSES across
    * seq-monotone batches (a later batch's change beats an earlier
    * batch's by the same per-key rule the one-shot apply uses), the
    * final snapshot equals [[applyChangelog]] of the whole log — the
    * stream is held to the batch oracle (x11), like the ingest gates.
    *
    * RETENTION: without a bound the `snap0..snapN` chain stores the
    * full snapshot once PER BATCH — at real churn rates that is the
    * first operational fire, long before correctness. Each batch
    * therefore prunes the version falling off the retention window:
    * after writing `snap{B+1}`, versions below `B+1 - retainVersions`
    * are deleted. `retainVersions >= 1` is a REPLAY-SAFETY floor, not
    * a tuning choice: a micro-batch that crashes after its snapshot
    * write but before its checkpoint commit replays and re-reads
    * `snap{B}` — so the current batch's INPUT version must survive its
    * own pruning pass (anything older belongs to committed batches,
    * which the checkpoint never replays). Larger values buy
    * time-travel depth at one snapshot of storage each;
    * `Int.MaxValue` keeps every version (the spec's
    * every-version-queryable mode).
    */
  def streamApply(ss: org.apache.spark.sql.SparkSession,
      base: DataFrame, log: DataFrame, keys: Seq[String],
      seqCol: String, opCol: String, nFiles: Int,
      root: String, retainVersions: Int = 2): DataFrame = {
    require(retainVersions >= 1,
      s"streamApply: retainVersions >= 1 (got $retainVersions) — the " +
        "in-flight batch's input version must survive for replay")
    // seed/stage/replay through the ONE shared skeleton
    // (StreamingOps.versionedReplay — resume-safe seed, empty-log
    // short-circuit). version = batchId + 1: the DURABLE counter — a
    // replayed batch reads version batchId and overwrites version
    // batchId+1, so the retry is idempotent and a restarted stream
    // resumes correctly.
    val staged = graft.streaming.StreamingOps.versionedReplay(
        ss, log, seqCol, nFiles, root) {
      // a complete snap0 = seeded (quiet ticks never create the
      // checkpoint, and must not re-pay the full base write)
      completeDir(ss, s"$root/snap0")
    } {
      base.write.mode("overwrite").parquet(s"$root/snap0")
    } { (batch, batchId) =>
      val snap = ss.read.parquet(s"$root/snap$batchId")
      applyChangelog(snap, batch, keys, seqCol, opCol)
        .write.mode("overwrite").parquet(s"$root/snap${batchId + 1}")
      // prune the ONE version falling off the window (batch K+retain
      // deletes snapK, so every expired version is eventually the
      // boundary of exactly one batch — O(1) filesystem work per
      // batch, idempotent under replay, no directory sweep)
      val expired = batchId - retainVersions
      if (expired >= 0 && retainVersions != Int.MaxValue) {
        val dead = new org.apache.hadoop.fs.Path(s"$root/snap$expired")
        dead.getFileSystem(ss.sparkContext.hadoopConfiguration)
          .delete(dead, true)
      }
    }
    // the CURRENT version is DERIVED, not discovered: the staged log
    // replays as exactly one micro-batch per STAGED file (sparse seq
    // ranges can stage fewer than nFiles), so the final snapshot is
    // snap{staged} — batch N reads snapN and writes snapN+1, and a
    // restarted stream that finds every batch committed still lands
    // on the same version. A max() over the directory would instead
    // adopt a HIGHER-numbered leftover snapshot from a previous
    // longer run sharing the root; assert the derived version exists
    // rather than trusting the listing. The ONE exception is a QUIET
    // TICK (empty changelog, staged == 0) on an already-advanced
    // root: there is no derived counter, snap0 may be pruned, and the
    // newest-on-disk version is safe precisely because the signature
    // guard pins a root to one staged log — every snapshot present
    // belongs to this root's one committed chain. Serving the current
    // state IS the batch oracle's answer for an empty log.
    val serve =
      if (staged == 0) newestVersioned(ss, root, "snap", "streamApply")
      else staged
    val p = new org.apache.hadoop.fs.Path(s"$root/snap$serve")
    val fs = p.getFileSystem(ss.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"streamApply: expected final snapshot $p after $staged " +
        "micro-batches — the replay did not commit every staged file")
    ss.read.parquet(s"$root/snap$serve")
  }

  /** A COMPLETE snapshot directory: the writer's `_SUCCESS` marker
    * when the job config emits one (the default), else at least one
    * committed data file — a mid-write crash leaves only
    * `_temporary`/dot files behind, and both the quiet-tick serve and
    * the seed-skip must treat that as absent, never as state. The
    * config check matters on object stores, where
    * `mapreduce.fileoutputcommitter.marksuccessfuljobs=false` is
    * standard tuning — keying on the marker alone there would make
    * every quiet tick throw "never seeded" on a fully seeded root
    * (and re-pay the seed write on a quiet-started one).
    */
  private def completeDir(ss: org.apache.spark.sql.SparkSession,
      dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val conf = ss.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) false
    else if (conf.getBoolean(
        "mapreduce.fileoutputcommitter.marksuccessfuljobs", true))
      fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
    else fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** Newest COMPLETE on-disk version of a `<prefix><N>` artifact
    * chain — the quiet-tick serve path of the streaming twins (see
    * the comment at the [[streamApply]] tail for why the listing is
    * trustworthy exactly there and nowhere else). Incomplete
    * directories (mid-write crash) are skipped; a COMPLETE snapshot
    * whose batch's checkpoint commit is still pending may serve —
    * that content is exactly what the deterministic replay will
    * re-write and commit, so the quiet tick is converged-early, never
    * divergent.
    */
  private def newestVersioned(ss: org.apache.spark.sql.SparkSession,
      root: String, prefix: String, who: String): Int = {
    val ns = listVersions(ss, root, prefix)
      .filter(v => completeDir(ss, s"$root/$prefix$v"))
    require(ns.nonEmpty,
      s"$who: no complete $prefix versions under $root after a " +
        "quiet (empty-log) tick — the root was never seeded")
    ns.max
  }

  /** CONTINUOUS incremental-aggregate maintenance — the streaming MV
    * pipeline: each micro-batch advances BOTH the versioned snapshot
    * (as [[streamApply]]) and a versioned aggregate artifact, the
    * aggregate via [[maintainAggs]] against the PRE-batch snapshot
    * version (which snapshot isolation keeps intact — batch B reads
    * `snap{B}`/`agg{B}` and writes `snap{B+1}`/`agg{B+1}`, never
    * overwriting its inputs, so a crashed batch replays cleanly).
    *
    * The aggregate is seeded ONCE from the base — the only full
    * aggregation in the lifetime of the view; every subsequent batch
    * does churn-sized work regardless of snapshot size. Because
    * maintenance against the current snapshot composes across
    * seq-monotone batches, the final aggregate equals a full
    * recompute over the fully-applied snapshot — held to the BATCH
    * oracle (x12), like every streaming twin.
    *
    * Same retention contract as [[streamApply]] (`retainVersions >= 1`
    * is the replay-safety floor), applied to both artifact chains.
    * Returns the final aggregate version.
    */
  /** THE maintained-view aggregate definition — per-`dims` sums +
    * count — shared by every seeding/recompute site (here and
    * [[PartitionedCdc]]) so the batch and stream oracles can never
    * silently diverge on the view's shape.
    */
  private[operators] def groupAgg(df: DataFrame, dims: Seq[String],
      sumCols: Seq[String], cntCol: String): DataFrame = {
    val aggs = sumCols.map(c => sum(col(c)).as(c)) :+
      count(lit(1)).as(cntCol)
    df.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  def streamMaintain(ss: org.apache.spark.sql.SparkSession,
      base: DataFrame, log: DataFrame, keys: Seq[String],
      seqCol: String, opCol: String, nFiles: Int, root: String,
      dims: Seq[String], sumCols: Seq[String], cntCol: String = "n",
      retainVersions: Int = 2): DataFrame = {
    require(retainVersions >= 1,
      s"streamMaintain: retainVersions >= 1 (got $retainVersions)")
    def aggOf(df: DataFrame): DataFrame =
      groupAgg(df, dims, sumCols, cntCol)
    // shared skeleton: BOTH seeds are skipped on a resumed root (the
    // aggregate seed is "the only full aggregation in the lifetime of
    // the view" precisely because of the resume guard)
    val staged = graft.streaming.StreamingOps.versionedReplay(
        ss, log, seqCol, nFiles, root) {
      // BOTH seed artifacts complete = seeded (the seed writes run
      // concurrently; a crash leaving either incomplete re-seeds —
      // overwrites converge)
      completeDir(ss, s"$root/snap0") && completeDir(ss, s"$root/agg0")
    } {
      // the two seed writes are independent overwrites; overlapped
      // (Par.both). Crash between/during them still converges: the
      // seeded check above requires BOTH complete, so any partial
      // state re-seeds and the overwrites converge.
      Par.both {
        base.write.mode("overwrite").parquet(s"$root/snap0")
      } {
        aggOf(base).write.mode("overwrite").parquet(s"$root/agg0")
      }
      ()
    } { (batch, batchId) =>
      val snap = ss.read.parquet(s"$root/snap$batchId")
      val agg = ss.read.parquet(s"$root/agg$batchId")
      // both writes key on version batchId+1 and read only version
      // batchId — independent, so they overlap (Par.both). A crash
      // that completes one but not the other replays the batch (the
      // checkpoint commit is after the body) and both overwrites
      // converge — the same recovery as the sequential form, whose
      // agg-then-snap order also left a one-sided window.
      Par.both {
        maintainAggs(agg, snap, batch, keys, seqCol, opCol,
          dims, sumCols, cntCol)
          .write.mode("overwrite").parquet(s"$root/agg${batchId + 1}")
      } {
        applyChangelog(snap, batch, keys, seqCol, opCol)
          .write.mode("overwrite").parquet(s"$root/snap${batchId + 1}")
      }
      val expired = batchId - retainVersions
      if (expired >= 0 && retainVersions != Int.MaxValue) {
        val conf = ss.sparkContext.hadoopConfiguration
        Seq(s"$root/snap$expired", s"$root/agg$expired").foreach { d =>
          val dead = new org.apache.hadoop.fs.Path(d)
          dead.getFileSystem(conf).delete(dead, true)
        }
      }
    }
    // quiet tick: serve the newest committed aggregate (see the
    // streamApply tail for the listing-trust rationale)
    val serve =
      if (staged == 0) newestVersioned(ss, root, "agg", "streamMaintain")
      else staged
    val p = new org.apache.hadoop.fs.Path(s"$root/agg$serve")
    val fs = p.getFileSystem(ss.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"streamMaintain: expected final aggregate $p after $staged " +
        "micro-batches — the replay did not commit every staged file")
    ss.read.parquet(s"$root/agg$serve")
  }
}
