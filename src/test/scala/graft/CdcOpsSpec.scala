package graft

import org.apache.spark.sql.functions._
import graft.operators.CdcOps

/** Changelog application semantics: latest-wins per key, delete drops,
  * insert lands, untouched base survives — and the plan collapses the
  * changelog with a hash aggregation, not a per-key window sort.
  */
class CdcOpsSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a"), (2L, "b"), (3L, "c")
  ).toDF("k", "v").withColumn("src", lit("base"))

  // k=1: updated twice (seq 2 wins); k=2: deleted AFTER an update;
  // k=3: untouched; k=4: pure insert; k=5: insert then delete (never
  // lands). Seqs deliberately arrive out of order.
  private def log = Seq(
    (1L, 2L, "U", "a2"), (1L, 1L, "U", "a1"),
    (2L, 2L, "D", "dead"), (2L, 1L, "U", "b1"),
    (4L, 1L, "U", "d"),
    (5L, 2L, "D", "dead"), (5L, 1L, "U", "e")
  ).toDF("k", "seq", "op", "v").withColumn("src", lit("cdc"))

  test("latest-wins apply: update, delete-after-update, insert, untouched") {
    val out = CdcOps.applyChangelog(base, log, Seq("k"), "seq", "op")
      .as[(Long, String, String)].collect().toSeq.sorted
    assert(out === Seq(
      (1L, "a2", "cdc"), // latest update wins over seq 1
      (3L, "c", "base"), // untouched base row survives as-is
      (4L, "d", "cdc")   // pure insert lands
      // 2 and 5 end deleted
    ))
  }

  test("the changelog collapses by hash aggregation, not a window sort") {
    val plan = CdcOps.applyChangelog(base, log, Seq("k"), "seq", "op")
      .queryExecution.executedPlan.toString
    assert(plan.contains("max_by") || plan.contains("HashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
