package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered (time-series) operators — the reference's per-series edit
  * engine re-expressed as Spark window functions.
  *
  * The reference iterates each series row-by-row in Python
  * (reference: src/GAMUTRawData/odmservices/edit_service.py:66-365).
  * Here every operator is a window over `partitionBy(keys).orderBy(ts,
  * tiebreak)` — all series are processed data-parallel in one pass, no
  * per-series driver loop, no single-partition bottleneck: at 100 TB the
  * work distributes by series key across executors.
  *
  * Determinism: ties on the timestamp are broken by `tiebreak`
  * (SURVEY.md §7.5 risk 4).
  */
object EditOps {

  private def w(keys: Seq[String], ts: String, tiebreak: String) =
    Window.partitionBy(keys.map(col): _*).orderBy(col(ts), col(tiebreak))

  /** W1 — data-gap detection (reference: edit_service.py:112-145).
    * Flags BOTH endpoints of consecutive pairs whose time delta is >=
    * `thresholdSec`. Sub-second precision kept via epoch microseconds.
    */
  def withGapFlags(df: DataFrame, keys: Seq[String], ts: String,
      tiebreak: String, thresholdSec: Double): DataFrame = {
    val ww = w(keys, ts, tiebreak)
    val us = unix_micros(col(ts))
    val gapBefore = us - lag(us, 1).over(ww)
    val gapAfter  = lead(us, 1).over(ww) - us
    // LONG microseconds, not a double: thresholds whose scaling
    // rounds up an ulp (0.000123 * 1e6 = 123.00000000000001) would
    // otherwise un-flag a gap exactly AT the threshold, violating the
    // documented >= semantics (whole-second thresholds are exact
    // either way)
    val t = lit(math.round(thresholdSec * 1e6))
    df.withColumn("gap_flag",
      coalesce(gapBefore >= t, lit(false)) ||
      coalesce(gapAfter >= t, lit(false)))
  }

  /** W2 — value-change threshold (reference: edit_service.py:147-164).
    * Flags both points of consecutive pairs with |v1-v2| >= threshold.
    */
  def withValueChangeFlags(df: DataFrame, keys: Seq[String], ts: String,
      tiebreak: String, value: String, threshold: Double): DataFrame = {
    val ww = w(keys, ts, tiebreak)
    val v = col(value)
    df.withColumn("change_flag",
      coalesce(abs(v - lag(v, 1).over(ww)) >= threshold, lit(false)) ||
      coalesce(abs(lead(v, 1).over(ww) - v) >= threshold, lit(false)))
  }

  /** W3 — consecutive-run grouping (gaps-and-islands;
    * reference: get_selection_groups, edit_service.py:341-360).
    * Adds `run_id`, constant within each maximal run of rows sharing
    * `selected`=true, ordered within the series. Non-selected rows get
    * NULL. Selected runs are numbered consecutively 1,2,3,… per series —
    * matching the reference's get_selection_groups, which enumerates only
    * the selected groups (a boundary is a selected row whose predecessor
    * is not selected).
    */
  /** The run-id expression behind [[withRunIds]], reusable under any
    * output column name.
    */
  private def runIdExpr(keys: Seq[String], ts: String, tiebreak: String,
      selected: Column): Column = {
    val ww = w(keys, ts, tiebreak)
    val sel = selected.cast("boolean")
    // boundary = selected row starting a new selected run (prev row is
    // non-selected or absent); non-selected rows never open a run.
    val boundary = sel && !coalesce(lag(sel, 1).over(ww), lit(false))
    val runId = sum(boundary.cast("long")).over(
      w(keys, ts, tiebreak).rowsBetween(Window.unboundedPreceding, 0))
    when(sel, runId)
  }

  def withRunIds(df: DataFrame, keys: Seq[String], ts: String,
      tiebreak: String, selected: Column): DataFrame =
    df.withColumn("run_id", runIdExpr(keys, ts, tiebreak, selected))

  /** W4 — linear interpolation over selected runs
    * (reference: interpolate, edit_service.py:279-309).
    * Each selected row gets `f(a) + (b-a)/(c-a) * (f(c)-f(a))` where a/c
    * are the nearest non-selected neighbors in time; runs touching either
    * series end keep their original value (no extrapolation).
    */
  def interpolate(df: DataFrame, keys: Seq[String], ts: String,
      tiebreak: String, value: String, selected: Column,
      out: String): DataFrame = {
    val ww = w(keys, ts, tiebreak)
    val before = ww.rowsBetween(Window.unboundedPreceding, -1)
    val after  = ww.rowsBetween(1, Window.unboundedFollowing)
    val us = unix_micros(col(ts)).cast("double")
    // An anchor must contribute its value AND its timestamp from the
    // SAME row, so both are gated on the same predicate — gating only
    // the value (the old shape) desynced them when a non-selected
    // neighbor held a NULL value: its timestamp still anchored pt/nt
    // while its value was skipped for an older row's, silently bending
    // the interpolation slope.
    val anchor = !selected && col(value).isNotNull
    val goodV  = when(anchor, col(value))
    val goodTs = when(anchor, us)
    val pv = last(goodV, ignoreNulls = true).over(before)
    val pt = last(goodTs, ignoreNulls = true).over(before)
    val nv = first(goodV, ignoreNulls = true).over(after)
    val nt = first(goodTs, ignoreNulls = true).over(after)
    val interp = pv + (us - pt) / (nt - pt) * (nv - pv)
    // nt === pt (tied anchor timestamps) would divide by zero → NaN;
    // keep the original value, as at the series ends
    df.withColumn(out,
      when(selected && pv.isNotNull && nv.isNotNull && nt =!= pt, interp)
        .otherwise(col(value)))
  }

  /** W5 — drift correction (reference: drift_correction,
    * edit_service.py:311-339): `y_i + G * (x_i / x_l)` with x_i seconds
    * since the selected run's start and x_l the run's span. The reference
    * requires a single contiguous run; here the formula is applied
    * per-series over the selected rows, with run extent computed by
    * window min/max.
    */
  def driftCorrect(df: DataFrame, keys: Seq[String], ts: String,
      value: String, selected: Column, gradient: Double,
      out: String): DataFrame = {
    val wp = Window.partitionBy(keys.map(col): _*)
    val us = unix_micros(col(ts)).cast("double")
    val selUs = when(selected, us)
    val x0 = min(selUs).over(wp)
    val x1 = max(selUs).over(wp)
    val corrected = col(value) +
      lit(gradient) * ((us - x0) / (x1 - x0))
    df.withColumn(out,
      when(selected && (x1 > x0), corrected).otherwise(col(value)))
  }

  /** W5 variant — drift correction applied independently to EACH
    * maximal selected run (composition of [[withRunIds]] + the W5
    * formula over (series, run) partitions). The reference insists on a
    * single contiguous run per invocation
    * (edit_service.py:318-321 raises on multiple groups); this
    * generalization corrects every run from its own start, which is the
    * natural data-parallel extension.
    */
  def driftCorrectRuns(df: DataFrame, keys: Seq[String], ts: String,
      tiebreak: String, value: String, selected: Column, gradient: Double,
      out: String): DataFrame = {
    // internal working column (the __ convention): building on the
    // public "run_id" name would clobber — and then drop — a caller's
    // own run_id column
    val runCol = "__drift_run_id"
    require(!df.columns.contains(runCol),
      s"driftCorrectRuns: input already has a '$runCol' column — " +
        "rename it first")
    val withRuns = df.withColumn(runCol,
      runIdExpr(keys, ts, tiebreak, selected))
    val wp = Window.partitionBy((keys :+ runCol).map(col): _*)
    val us = unix_micros(col(ts)).cast("double")
    val x0 = min(us).over(wp)
    val x1 = max(us).over(wp)
    val corrected = col(value) + lit(gradient) * ((us - x0) / (x1 - x0))
    withRuns.withColumn(out,
      when(col(runCol).isNotNull && (x1 > x0), corrected)
        .otherwise(col(value)))
      .drop(runCol)
  }

  /** W6 — season bucket from month (reference: calcSeason,
    * series_service.py:597-609): month -> 1..4.
    */
  def season(ts: Column): Column = floor((month(ts) - 1) / 3) + 1
}
