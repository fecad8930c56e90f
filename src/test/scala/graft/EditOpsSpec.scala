package graft

import org.apache.spark.sql.functions._
import graft.operators.EditOps

class EditOpsSpec extends SparkSpec {
  import spark.implicits._

  private def series = Seq(
    // (series, id, ts, value)
    (1L, 1L, ts("2024-01-01 00:00:00"), 10.0),
    (1L, 2L, ts("2024-01-01 00:10:00"), 12.0),
    (1L, 3L, ts("2024-01-01 02:10:00"), 200.0), // 2h gap before
    (1L, 4L, ts("2024-01-01 02:20:00"), 14.0),
    (2L, 5L, ts("2024-01-01 00:00:00"), 1.0)
  ).toDF("sid", "id", "t", "v")

  test("gap flags mark both endpoints of a large gap") {
    val out = EditOps.withGapFlags(series, Seq("sid"), "t", "id", 3600.0)
      .orderBy("id").select("gap_flag").as[Boolean].collect().toSeq
    assert(out === Seq(false, true, true, false, false))
  }

  test("value-change flags mark both points of a large jump") {
    val out = EditOps.withValueChangeFlags(series, Seq("sid"), "t", "id",
        "v", 100.0)
      .orderBy("id").select("change_flag").as[Boolean].collect().toSeq
    assert(out === Seq(false, true, true, true, false))
  }

  test("run ids number only selected runs, consecutively per series") {
    val df = Seq(
      (1L, 1L, false), (1L, 2L, true), (1L, 3L, true),
      (1L, 4L, false), (1L, 5L, true),
      (2L, 6L, true)
    ).toDF("sid", "id", "sel")
      .withColumn("t", to_timestamp(lit("2024-01-01 00:00:00")) +
        expr("make_interval(0,0,0,0,0,0,id)"))
    val out = EditOps.withRunIds(df, Seq("sid"), "t", "id", col("sel"))
      .orderBy("id").select("run_id").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(out === Seq(None, Some(1L), Some(1L), None, Some(2L), Some(1L)))
  }

  test("interpolation is linear in time between non-selected neighbors") {
    val df = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), 0.0, false),
      (1L, 2L, ts("2024-01-01 00:00:10"), 99.0, true),
      (1L, 3L, ts("2024-01-01 00:00:20"), 20.0, false),
      // run touching series end: kept as-is
      (1L, 4L, ts("2024-01-01 00:00:30"), 77.0, true)
    ).toDF("sid", "id", "t", "v", "sel")
    val out = EditOps.interpolate(df, Seq("sid"), "t", "id", "v",
        col("sel"), "vi")
      .orderBy("id").select("vi").as[Double].collect().toSeq
    assert(out(0) === 0.0 && out(2) === 20.0)
    assert(math.abs(out(1) - 10.0) < 1e-9) // halfway between 0 and 20
    assert(out(3) === 77.0)                // no right neighbor
  }

  test("drift correction is linear in elapsed fraction of the run") {
    val df = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, 2L, ts("2024-01-01 00:00:50"), 1.0),
      (1L, 3L, ts("2024-01-01 00:01:40"), 1.0)
    ).toDF("sid", "id", "t", "v")
    val out = EditOps.driftCorrect(df, Seq("sid"), "t", "v",
        lit(true), 10.0, "vc")
      .orderBy("id").select("vc").as[Double].collect().toSeq
    assert(out === Seq(1.0, 6.0, 11.0)) // +G*(0, .5, 1)
  }

  test("window ops tolerate empty input") {
    val empty = series.filter(col("id") < 0)
    assert(EditOps.withGapFlags(empty, Seq("sid"), "t", "id", 10.0)
      .count() === 0)
    assert(EditOps.withRunIds(empty, Seq("sid"), "t", "id",
      col("v") > 0).count() === 0)
    assert(EditOps.interpolate(empty, Seq("sid"), "t", "id", "v",
      col("v") > 0, "vi").count() === 0)
    assert(EditOps.driftCorrect(empty, Seq("sid"), "t", "v",
      col("v") > 0, 1.0, "vc").count() === 0)
  }

  test("season buckets months into quarters") {
    val df = Seq.tabulate(12)(m => (m + 1, ts(f"2024-${m + 1}%02d-15 00:00:00")))
      .toDF("m", "t")
    val out = df.select(EditOps.season(col("t")).cast("int"))
      .as[Int].collect().toSeq
    assert(out === Seq(1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4))
  }
}
