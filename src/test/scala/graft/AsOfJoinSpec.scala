package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("interval join counts trailing-window matches exactly once") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:10:00")),
      (1L, 11L, ts("2024-01-01 01:00:00")), // nothing within 5 min
      (2L, 12L, ts("2024-01-01 00:10:00"))  // other key
    ).toDF("user", "id", "t")
    val right = Seq(
      (1L, ts("2024-01-01 00:05:00")),  // exactly window-start: excluded
      (1L, ts("2024-01-01 00:05:01")),  // in window
      (1L, ts("2024-01-01 00:09:59")),  // in window, crosses band edge
      (1L, ts("2024-01-01 00:10:00")),  // equal ts: included
      (1L, ts("2024-01-01 00:10:01"))   // after left: excluded
    ).toDF("user", "t")
    val out = graft.operators.IntervalJoin.trailingCount(
        left, right, Seq("user"), "t", 300L, "n")
      .orderBy("id").select("id", "n").as[(Long, Long)].collect().toSeq
    assert(out === Seq((10L, 3L), (11L, 0L), (12L, 0L)))
  }

  test("as-of join attaches latest right value at or before left ts") {
    val left = Seq(
      (1L, 100L, ts("2024-01-01 00:10:00")),
      (1L, 101L, ts("2024-01-01 00:30:00")),
      (1L, 102L, ts("2024-01-01 00:05:00")), // before any right row
      (2L, 103L, ts("2024-01-01 00:30:00"))  // key with no right rows
    ).toDF("user", "id", "t")
    val right = Seq(
      (1L, ts("2024-01-01 00:10:00"), 10.0), // tie: 'at or before' wins
      (1L, ts("2024-01-01 00:20:00"), 20.0)
    ).toDF("user", "t", "v")
    val out = AsOfJoin.asOf(left, right, Seq("user"), "t", "v", "asof_v")
      .orderBy("id")
      .select("id", "asof_v").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSeq
    assert(out === Seq(
      (100L, Some(10.0)), // equal-ts right row counts
      (101L, Some(20.0)), // latest preceding
      (102L, None),       // nothing at or before
      (103L, None)))      // no right rows for key
  }
}
