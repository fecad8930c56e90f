package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.EditOps

/** Property-based invariants for the window edit operators (SURVEY.md
  * §5.2): checked over randomized series rather than hand-picked cases.
  * Gen is driven directly with fixed seeds (no scalatest bridge needed
  * in the offline build), so failures are reproducible.
  */
class EditOpsPropertySpec extends SparkSpec {
  import spark.implicits._

  private val seriesGen: Gen[List[(Long, Double, Boolean)]] = for {
    n <- Gen.choose(2, 30)
    rows <- Gen.listOfN(n, for {
      v <- Gen.choose(-100.0, 100.0)
      sel <- Gen.oneOf(true, false)
    } yield (v, sel))
  } yield rows.zipWithIndex.map { case ((v, s), i) => (i.toLong, v, s) }

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def frame(rows: List[(Long, Double, Boolean)]) =
    rows.toDF("id", "v", "sel")
      .withColumn("sid", lit(1L))
      .withColumn("t", to_timestamp(lit("2024-01-01 00:00:00")) +
        expr("make_interval(0,0,0,0,0,0,id*60)"))

  test("interpolation: non-selected rows keep their value exactly") {
    for (rows <- samples(seriesGen, 15)) {
      val out = EditOps.interpolate(frame(rows), Seq("sid"), "t", "id",
          "v", col("sel"), "vi")
        .filter(!col("sel"))
        .select(abs(col("v") - col("vi"))).as[Double].collect()
      assert(out.forall(_ === 0.0), s"rows=$rows")
    }
  }

  test("interpolation: interpolated values are bounded by neighbor range") {
    for (rows <- samples(seriesGen, 15)) {
      val out = EditOps.interpolate(frame(rows), Seq("sid"), "t", "id",
        "v", col("sel"), "vi")
      val unsel = rows.filter(!_._3).map(_._2)
      if (unsel.nonEmpty) {
        val (lo, hi) = (unsel.min, unsel.max)
        val interp = out.filter(col("sel"))
          .orderBy("id").select("vi").as[Double].collect().toSeq
        val changed = rows.filter(_._3).map(_._2).zip(interp)
          .filter { case (orig, res) => res != orig }
        assert(changed.forall { case (_, r) =>
          r >= lo - 1e-9 && r <= hi + 1e-9
        }, s"rows=$rows interp=$interp")
      }
    }
  }

  test("run ids: null iff unselected; runs numbered 1..n consecutively") {
    for (rows <- samples(seriesGen, 15)) {
      val out = EditOps.withRunIds(frame(rows), Seq("sid"), "t", "id",
          col("sel"))
        .orderBy("id")
        .select("sel", "run_id").collect()
        .map(r => (r.getBoolean(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toSeq
      assert(out.forall { case (s, rid) => s === rid.isDefined },
        s"rows=$rows out=$out")
      val ids = out.flatMap(_._2)
      if (ids.nonEmpty) {
        assert(ids.head === 1L)
        val distinctRuns = ids.distinct
        assert(distinctRuns === (1L to distinctRuns.length.toLong),
          s"rows=$rows ids=$ids")
      }
    }
  }

  test("gap flags: a qualifying gap flags both endpoints, nothing else") {
    val offsetsGen = Gen.listOfN(12, Gen.choose(0L, 7200L))
    for (offs <- samples(offsetsGen, 15)) {
      val rows = offs.distinct.sorted.zipWithIndex
        .map { case (o, i) => (i.toLong, o) }
      if (rows.length >= 2) {
        val df = rows.toDF("id", "off")
          .withColumn("sid", lit(1L))
          .withColumn("t", to_timestamp(lit("2024-01-01 00:00:00")) +
            expr("make_interval(0,0,0,0,0,0,off)"))
        val got = EditOps.withGapFlags(df, Seq("sid"), "t", "id", 1800.0)
          .orderBy("id").select("gap_flag").as[Boolean].collect().toSeq
        val ts = rows.map(_._2)
        val expected = ts.indices.map { i =>
          val before = i > 0 && ts(i) - ts(i - 1) >= 1800L
          val after = i < ts.length - 1 && ts(i + 1) - ts(i) >= 1800L
          before || after
        }
        assert(got === expected, s"offs=$ts")
      }
    }
  }
}
