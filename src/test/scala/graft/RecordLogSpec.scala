package graft

import org.apache.spark.sql.functions._
import graft.operators.{RecordLog, RecordedSession}
import graft.operators.RecordLog._

/** Provenance log: record → serialize → parse → replay reproduces the
  * edited frame exactly (reference: record_service.py records each GUI
  * edit as a replayable script line).
  */
class RecordLogSpec extends SparkSpec {
  import spark.implicits._

  private val shape = Shape(Seq("user_id"), "ts", "event_id", "value",
    "selected")

  private def base = Seq(
    (1L, "2024-01-01 00:00:00", 10L, 5.0),
    (2L, "2024-01-01 01:00:00", 10L, 50.0),
    (3L, "2024-01-01 02:00:00", 10L, 60.0),
    (4L, "2024-01-01 03:00:00", 10L, 7.0),
    (5L, "2024-01-01 00:30:00", 20L, 100.0),
    (6L, "2024-01-01 01:30:00", 20L, 300.0))
    .toDF("event_id", "tss", "user_id", "value")
    .withColumn("ts", to_timestamp(col("tss"))).drop("tss")

  private val actions: Seq[EditAction] = Seq(
    FilterValue(">", 40.0, intersect = false),
    FilterValue("<", 200.0, intersect = true),
    ChangeValue("*", 2.0),
    FlagSelected("qualifier", 7L),
    FilterDate("2024-01-01 00:15:00", "2024-01-01 02:30:00",
      intersect = false),
    Interpolate(),
    SelectPoints("event_id", Seq(6L)),
    DeleteSelected())

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    rowsOf(df.select("event_id", "user_id", "value", "qualifier",
      "selected").orderBy("event_id"))

  test("recorded session script replays to the identical frame") {
    val sess = actions.foldLeft(RecordedSession.open(base, shape))(_(_))
    val script = sess.script
    val (parsedShape, parsedActions) = RecordLog.parse(script)
    assert(parsedShape === shape)
    assert(parsedActions === actions)
    val replayed = RecordLog.replay(base, parsedShape, parsedActions)
    assert(canon(replayed) === canon(sess.df))
    assert(canon(sess.df).nonEmpty)
  }

  test("edits actually changed data and delete removed the point") {
    val sess = actions.foldLeft(RecordedSession.open(base, shape))(_(_))
    val out = sess.df.select("event_id", "value", "qualifier")
      .orderBy("event_id").as[(Long, Double, Option[Long])].collect()
    // 50 and 60 were doubled and flagged 7, then the date-window
    // re-selection interpolated them between their non-selected
    // neighbors (5.0 @ 00:00 and 7.0 @ 03:00): 5 + t/3h * 2.
    assert(out.find(_._1 == 2L).exists(r =>
      math.abs(r._2 - 17.0 / 3) < 1e-9 && r._3 == Some(7L)))
    assert(out.find(_._1 == 3L).exists(r =>
      math.abs(r._2 - 19.0 / 3) < 1e-9 && r._3 == Some(7L)))
    // event 5 (100.0) was doubled by the value selection; user 20's
    // date-selected run then touches both series ends -> kept at 200
    assert(out.find(_._1 == 5L).exists(_._2 == 200.0))
    // event 6 deleted by the final select+delete
    assert(!out.exists(_._1 == 6L))
  }

  test("delimiter-bearing names are rejected at construction") {
    // a name with , = ; or ) would mis-split in parse() and break the
    // parse∘serialize ≡ identity contract — fail fast instead
    intercept[IllegalArgumentException](
      Shape(Seq("user_id"), "ts", "event,id", "value", "selected"))
    intercept[IllegalArgumentException](FlagSelected("flag=col", 7L))
    intercept[IllegalArgumentException](Rekey("k;ey", 1L))
    intercept[IllegalArgumentException](SelectPoints("id)col", Seq(1L)))
    intercept[IllegalArgumentException](
      FilterDate("2020-01-01 00:00:00", "2020, DROP", intersect = true))
    // legal timestamp bounds still pass
    FilterDate("2020-01-01 00:00:00", "", intersect = true)
  }

  test("rollback drops both frame state and the provenance line") {
    val s0 = RecordedSession.open(base, shape)
    val s1 = s0(FilterValue(">", 40.0, intersect = false))
    val s2 = s1(DeleteSelected())
    assert(s2.rollback.history === s1.history)
    assert(canon2(s2.rollback.df) === canon2(s1.df))
  }

  private def canon2(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    rowsOf(df.select("event_id", "value", "selected").orderBy("event_id"))

  test("null measurements are never selected — and never deleted") {
    // value NULL makes `value < x` three-valued NULL; the selection
    // must coalesce it to false, or DeleteSelected's filter(!sel)
    // silently drops the never-selected row
    val withNull = Seq(
      (1L, "2024-01-01 00:00:00", 10L, Some(5.0)),
      (2L, "2024-01-01 01:00:00", 10L, None: Option[Double]),
      (3L, "2024-01-01 02:00:00", 10L, Some(60.0)))
      .toDF("event_id", "tss", "user_id", "value")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val out = RecordLog.replay(withNull, shape, Seq(
      FilterValue("<", 10.0, intersect = false),
      DeleteSelected()))
    // row 1 (5.0 < 10) deleted; row 2 (NULL value) SURVIVES; row 3 too
    assert(out.select("event_id").as[Long].collect().toSeq.sorted
      === Seq(2L, 3L))
    // and the surviving rows' selection column is false, not null
    assert(out.select("selected").as[Boolean].collect().toSeq
      === Seq(false, false))
  }

  test("line-break-bearing bounds are rejected at construction") {
    intercept[IllegalArgumentException](
      FilterDate("2020-01-01 00:00:00\nx", "", intersect = true))
    intercept[IllegalArgumentException](
      FilterDate("", "2020-01-01 00:00:00\r", intersect = true))
  }

  test("keyless (single-series) shape round-trips through the script") {
    val keyless = Shape(Nil, "ts", "event_id", "value", "selected")
    val (parsed, acts) = RecordLog.parse(
      RecordLog.serialize(keyless, Seq(DeleteSelected())))
    assert(parsed === keyless)
    assert(acts === Seq(DeleteSelected()))
  }
}
