package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.PivotOps

/** SURVEY.md §2.5 pivot operators (V1-V4) over `events`: day plays the
  * reference's LocalDateTime index, event_type plays VariableCode,
  * user_id%2 plays MethodID, avg(value) matches pandas pivot_table's
  * aggfunc='mean' default.
  */
object PivotQueries {
  import Tables._

  /** Known pivot domain — comes from a dim in the reference; passing it
    * explicitly avoids Spark's eager distinct job (see PivotOps).
    */
  private val Types = Seq("click", "error", "purchase", "signup", "view")

  private def day = date_format(col("ts"), "yyyy-MM-dd").as("day")

  /** Per-"variable" NoDataValue sentinels (reference: Variable.NoDataValue,
    * odmdata/variable.py:23).
    */
  private val Sentinels = Map(
    "click" -> -999.0, "error" -> -888.0, "purchase" -> -777.0,
    "signup" -> -666.0, "view" -> -555.0)

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // V1: long→wide pivot, duplicates averaged
    // (reference: DatasetUtilities.py:166-169).
    "v1_pivot_wide" -> ((s, d) =>
      PivotOps.pivotWide(events(s, d), Seq(day), col("event_type"), Types,
        col("value"))),

    // V2: pivot + per-column sentinel fill
    // (reference: DatasetUtilities.py:171-175).
    "v2_pivot_sentinel" -> ((s, d) =>
      PivotOps.fillSentinels(
        PivotOps.pivotWide(events(s, d), Seq(day), col("event_type"), Types,
          col("value")),
        Sentinels)),

    // V3+V4: composed `code-method` pivot key — duplicate-column
    // disambiguation + MultiIndex flattening in one deterministic step
    // (reference: DatasetUtilities.py:295-341).
    "v3_pivot_dupcols" -> ((s, d) =>
      PivotOps.pivotWide(events(s, d), Seq(day),
        PivotOps.composedPivotKey(col("event_type"), col("user_id") % 2),
        for (t <- Types; m <- Seq(0, 1)) yield s"$t-$m",
        col("value"))),

    // Inverse reshape: V1 result unpivoted back to long form.
    "v4_unpivot" -> ((s, d) =>
      PivotOps.unpivot(
        PivotOps.pivotWide(events(s, d), Seq(day), col("event_type"), Types,
          col("value")),
        Seq("day"), Types, "event_type", "avg_value"))
  )

  private def avgCase(t: String, m: Option[Int] = None): String = {
    val cond = m match {
      case Some(i) => s"event_type = '$t' AND user_id % 2 = $i"
      case None    => s"event_type = '$t'"
    }
    s"round(avg(CASE WHEN $cond THEN value END), 2)"
  }

  def oracle: Map[String, String] = Map(
    "v1_pivot_wide" ->
      s"""SELECT strftime(ts, '%Y-%m-%d') AS day,
          ${Types.map(t => s"${avgCase(t)} AS \"$t\"").mkString(", ")}
          FROM events GROUP BY 1""",
    "v2_pivot_sentinel" ->
      s"""SELECT strftime(ts, '%Y-%m-%d') AS day,
          ${Types.map(t =>
            s"COALESCE(${avgCase(t)}, ${Sentinels(t)}) AS \"$t\"")
            .mkString(", ")}
          FROM events GROUP BY 1""",
    "v3_pivot_dupcols" ->
      s"""SELECT strftime(ts, '%Y-%m-%d') AS day,
          ${(for (t <- Types; m <- Seq(0, 1))
             yield s"${avgCase(t, Some(m))} AS \"$t-$m\"").mkString(", ")}
          FROM events GROUP BY 1""",
    "v4_unpivot" ->
      s"""WITH wide AS (
            SELECT strftime(ts, '%Y-%m-%d') AS day,
            ${Types.map(t => s"${avgCase(t)} AS \"$t\"").mkString(", ")}
            FROM events GROUP BY 1)
          ${Types.map(t =>
            s"""SELECT day, '$t' AS event_type, "$t" AS avg_value
                FROM wide WHERE "$t" IS NOT NULL""").mkString(" UNION ALL ")}"""
  )
}
