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
    val payload = log.columns.toSeq
      .filterNot(c => keys.contains(c) || c == seqCol)
    require((keys ++ payload).filterNot(_ == opCol).toSet ==
      base.columns.toSet,
      s"base columns ${base.columns.toSeq} must be keys $keys + " +
        s"changelog payload ${payload.filterNot(_ == opCol)}")
    val latest = log.groupBy(keys.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*), col(seqCol)).as("__c"))
      .select(keys.map(col) ++ payload.map(p => col(s"__c.$p")): _*)
    // shuffle-hash build on the collapsed keys: the base (the 100 TB
    // side) must never be SORTED for this join — SMJ would sort every
    // snapshot partition to anti-join a key set bounded by the
    // changelog's churn (ScaleProbe, 20M base + 2M log: 54 s SMJ →
    // 7.7 s SHJ). At cluster scale both sides bucket by the key
    // instead.
    val untouched = base.join(
      latest.select(keys.map(col): _*).hint("shuffle_hash"),
      keys, "left_anti")
    // op is NOT NULL by contract: a null op would make the =!= predicate
    // NULL and silently drop the row as if deleted — fail loudly at the
    // first null instead (raise_error costs nothing on the happy path,
    // unlike a validation count's extra pass over the changelog)
    val opOk = when(col(opCol).isNull,
      raise_error(lit("CdcOps: null op in changelog — every change row " +
        "must carry a non-null op code")).cast("boolean"))
      .otherwise(col(opCol) =!= deleteOp)
    untouched.unionByName(latest.filter(opOk).drop(opCol))
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
    base.write.mode("overwrite").parquet(s"$root/snap0")
    graft.streaming.StreamingOps.stageOrderedArrivals(
      log, seqCol, nFiles, s"$root/arrivals")
    // version = batchId + 1: the DURABLE counter — a replayed batch
    // reads version batchId and overwrites version batchId+1, so the
    // retry is idempotent and a restarted stream resumes correctly
    graft.streaming.StreamingOps.replayOrdered(ss, log.schema,
        s"$root/arrivals", s"$root/ckpt") { (batch, batchId) =>
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
    // replays as exactly `nFiles` one-file micro-batches, so the final
    // snapshot is snap{nFiles} — batch N reads snapN and writes
    // snapN+1, and a restarted stream that finds every batch committed
    // still lands on the same version. A max() over the directory
    // would instead adopt a HIGHER-numbered leftover snapshot from a
    // previous longer run sharing the root; assert the derived version
    // exists rather than trusting the listing.
    val p = new org.apache.hadoop.fs.Path(s"$root/snap$nFiles")
    val fs = p.getFileSystem(ss.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"streamApply: expected final snapshot $p after $nFiles " +
        "micro-batches — the replay did not commit every staged file")
    ss.read.parquet(s"$root/snap$nFiles")
  }
}
