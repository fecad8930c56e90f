package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded interval (time-proximity) join: for each left row, count
  * right rows of the same key whose timestamp falls in the trailing
  * window `(left.ts - windowSec, left.ts]`.
  *
  * A naive theta-join `ON key AND r.ts BETWEEN l.ts - w AND l.ts`
  * becomes a broadcast-nested-loop (or a skew-prone sort-merge on key
  * alone) at scale. The banded form buckets time into `windowSec`-wide
  * bands and replicates each RIGHT row into its own band and the next
  * one; the join is then a plain equi hash join on (key, band) — every
  * qualifying pair shares the left row's band by construction, each
  * pair matches in exactly one replica, and the exact window predicate
  * is a cheap post-filter on the hash-join output.
  *
  * Bands use exact integer FLOOR division on epoch microseconds (no fp
  * division near band edges, and no `div` truncation-toward-zero, which
  * would mis-band pre-1970 timestamps: -1 div w = 0 but the band below
  * zero is -1). All right-side columns are renamed before the join, so
  * self-joins (left and right derived from the same table) resolve
  * unambiguously. Left rows must be unique (e.g. carry an id): the
  * final groupBy collapses identical left rows.
  */
object IntervalJoin {

  /** Exact long floor division of a staged column: x - pmod(x, w) is the
    * largest multiple of w that is <= x, so the `div` is exact — correct
    * for negative epochs where plain `div` truncates toward zero.
    * All-integer arithmetic; no fp near band edges.
    */
  private def floorDiv(c: String, w: Long): Column =
    expr(s"($c - pmod($c, ${w}L)) div ${w}L")

  /** Count right-side events in the trailing window of each left row.
    * Output: all left rows (zero counts included) + `countCol`.
    */
  def trailingCount(left: DataFrame, right: DataFrame, keys: Seq[String],
      ts: String, windowSec: Long, countCol: String): DataFrame = {
    // working-name guard (the PackOps/SourceMix convention): a caller
    // column named like the staging columns would be silently
    // overwritten — and since the final groupBy keys on ALL left
    // columns, returned corrupted
    Seq("__lus", "__band").foreach(n =>
      require(!left.columns.contains(n),
        s"trailingCount: left already has a '$n' column — rename it"))
    require(!left.columns.contains(countCol),
      s"trailingCount: left already has a '$countCol' column — pick " +
        "another countCol (duplicate output name)")
    val us = windowSec * 1000000L
    val l = left
      .withColumn("__lus", unix_micros(col(ts)))
      .withColumn("__band", floorDiv("__lus", us))
    val r = right
      .select(keys.map(k => col(k).as(s"__r_$k")) :+
        unix_micros(col(ts)).as("__rus"): _*)
      .withColumn("__rband",
        explode(array(floorDiv("__rus", us),
          floorDiv("__rus", us) + lit(1L))))
    val cond =
      keys.map(k => col(k) === col(s"__r_$k")).reduce(_ && _) &&
        col("__band") === col("__rband") &&
        col("__rus") > col("__lus") - lit(us) &&
        col("__rus") <= col("__lus")
    l.join(r, cond, "left")
      .groupBy(left.columns.toIndexedSeq.map(col): _*)
      .agg(count(col("__rus")).as(countCol))
  }
}
