package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data-layout management — the write-side half of scan
  * performance at 100 TB. Partition pruning (BucketedIO, the
  * cell-partitioned indexes) covers directory-level skipping; these
  * ops cover the two layers below it:
  *
  *  - [[clusterWrite]]: range-cluster rows so parquet ROW-GROUP
  *    min/max stats become selective — a pushed range predicate then
  *    skips whole row groups inside every file (the sort-key
  *    clustering every lakehouse exposes as OPTIMIZE ... ZORDER /
  *    cluster-by; for 1-2 predicate columns a plain range sort gives
  *    the same skipping without the space-filling-curve machinery).
  *    Spec-measured: the same pushed filter reads a fraction of the
  *    rows from a clustered layout vs an unclustered one.
  *
  *  - [[compact]]: bin-pack a directory of small files into few large
  *    ones. Streaming sinks and per-batch appends (the ingest gates'
  *    decision logs, the index's per-batch bucket files) accrete
  *    files; at scale, file COUNT — listing, open cost, one task per
  *    tiny split — degrades scans long before data size does.
  *    Content-preserving by construction (one repartition, no
  *    column touches).
  *
  * Both are one distributed job with no driver-side row handling.
  */
object LayoutOps {

  /** Write `df` range-clustered on `cols`: rows shuffle into
    * `partitions` contiguous key ranges (one output file each) and
    * sort within each, so every row group's min/max on `cols` spans a
    * narrow slice. `extraWriteOpts` passes parquet writer knobs (e.g.
    * a small `parquet.block.size` to force many row groups in tests).
    */
  def clusterWrite(df: DataFrame, cols: Seq[String], partitions: Int,
      dir: String, extraWriteOpts: Map[String, String] = Map.empty): Unit = {
    require(cols.nonEmpty && partitions >= 1,
      s"clusterWrite: need cluster columns and partitions >= 1 " +
        s"(got $cols, $partitions)")
    df.repartitionByRange(partitions, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
      .write.options(extraWriteOpts).mode("overwrite").parquet(dir)
  }

  /** Rewrite `srcDir` as `targetFiles` parquet files in `dstDir`.
    * Round-robin repartition packs evenly regardless of input file
    * sizes; rows are untouched.
    */
  def compact(s: SparkSession, srcDir: String, dstDir: String,
      targetFiles: Int): Unit = {
    require(targetFiles >= 1,
      s"compact: targetFiles >= 1 (got $targetFiles)")
    // compare resolved paths, not spellings: a trailing slash or a
    // relative alias of the same dir would pass a string check and
    // the overwrite would destroy the source mid-read
    val (srcP, dstP) = (
      new org.apache.hadoop.fs.Path(srcDir),
      new org.apache.hadoop.fs.Path(dstDir))
    val fs = srcP.getFileSystem(s.sparkContext.hadoopConfiguration)
    require(fs.makeQualified(srcP) != fs.makeQualified(dstP),
      "compact: dstDir must differ from srcDir (the rewrite reads " +
        "srcDir while writing)")
    s.read.parquet(srcDir).repartition(targetFiles)
      .write.mode("overwrite").parquet(dstDir)
  }
}
