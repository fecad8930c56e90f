package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-action provenance: every session edit is a data value that can
  * be applied, serialized as a replayable script line, parsed back, and
  * replayed — the engine's answer to the reference's RecordService,
  * which records each GUI edit as a line of executable Python
  * (reference: src/GAMUTRawData/odmservices/record_service.py:14-101,
  * script header :169-175).
  *
  * Where the reference interleaves recording with mutation, here the
  * log IS the edit history: applying `actions.foldLeft(base)` to the
  * original frame reproduces the session state exactly (pure
  * transformations, deterministic given the same base), so a serialized
  * log is both provenance and a portable migration script.
  */
object RecordLog {

  /** The serialized script is a delimiter format (`,` `=` `;` `)`), so
    * every string that enters a script line must be delimiter-free —
    * otherwise parse() mis-splits and the parse∘serialize ≡ identity
    * provenance contract silently breaks. Column names are restricted
    * to identifiers at CONSTRUCTION (fail fast, not at replay).
    */
  private def ident(field: String, v: String): String = {
    require(v.matches("[A-Za-z0-9_]+"),
      s"$field must match [A-Za-z0-9_]+ (script-safe identifier), got '$v'")
    v
  }

  /** Free-text args (date bounds) may hold spaces/colons/dashes but
    * never the script delimiters.
    */
  private def delimFree(field: String, v: String): String = {
    // newline/CR are delimiters too — they terminate the physical
    // script LINE, so a bound containing one would serialize an
    // unparseable log (violating fail-fast-at-construction)
    require(!v.exists(c => ",=;()\n\r".contains(c)),
      s"$field must not contain any of , = ; ( ) or line breaks — got '$v'")
    // leading/trailing whitespace would survive serialize but not
    // parse (args trims values) — the parse(serialize(x)) == x
    // identity requires rejecting it here
    require(v == v.trim,
      s"$field must not carry leading/trailing whitespace — got '$v'")
    v
  }

  /** Date bounds additionally fail at CONSTRUCTION when unparseable:
    * replayed `to_timestamp` would yield NULL, [[refine]] would
    * coalesce the three-valued predicate to an all-false selection,
    * and the action would be a silent no-op the log believes
    * succeeded.
    */
  private def dateBound(field: String, v: String): String = {
    delimFree(field, v)
    require(v.isEmpty ||
      scala.util.Try(java.sql.Timestamp.valueOf(v)).isSuccess ||
      scala.util.Try(java.time.LocalDate.parse(v)).isSuccess,
      s"$field must be 'yyyy-MM-dd[ HH:mm:ss[.f]]', got '$v'")
    v
  }

  /** Column shape of the series frame being edited: series key columns,
    * event-time order (+ tiebreak), the measured value, and the boolean
    * selection column the filter actions refine.
    */
  final case class Shape(keys: Seq[String], ts: String, tiebreak: String,
      value: String, selected: String) {
    (keys ++ Seq(ts, tiebreak, value, selected))
      .foreach(ident("shape column", _))
  }

  sealed trait EditAction {
    /** Replay this action on a session frame. */
    def apply(shape: Shape, df: DataFrame): DataFrame
    /** One replayable script line (parsed back by [[parse]]). */
    def line: String
  }

  private def sel(shape: Shape): Column = col(shape.selected)

  private def refine(shape: Shape, df: DataFrame, pred: Column,
      intersect: Boolean): DataFrame = {
    // coalesce the three-valued predicate to FALSE: a NULL measurement
    // makes `value < x` NULL, and a NULL stored in the selection column
    // later inverts to NULL in DeleteSelected's filter(!sel) — which
    // DROPS the row, silently deleting points the user never selected.
    // Selection semantics are boolean: unknown = not selected.
    val p = coalesce(pred, lit(false))
    df.withColumn(shape.selected,
      if (intersect) sel(shape) && p else p)
  }

  /** P8 — value threshold selection (edit_service.py:66-85). */
  final case class FilterValue(op: String, v: Double, intersect: Boolean)
      extends EditAction {
    require(op == "<" || op == ">", s"op must be < or >, got $op")
    def apply(shape: Shape, df: DataFrame): DataFrame = {
      val p = if (op == "<") col(shape.value) < v else col(shape.value) > v
      refine(shape, df, p, intersect)
    }
    def line = s"filter_value(op=$op, v=$v, intersect=$intersect)"
  }

  /** P9 — date window selection (edit_service.py:87-109). Bounds are
    * `yyyy-MM-dd HH:mm:ss` strings; either side may be empty (open).
    */
  final case class FilterDate(after: String, before: String,
      intersect: Boolean) extends EditAction {
    dateBound("after", after); dateBound("before", before)
    def apply(shape: Shape, df: DataFrame): DataFrame = {
      val t = col(shape.ts)
      val preds = Seq(
        Option(after).filter(_.nonEmpty).map(a => t > to_timestamp(lit(a))),
        Option(before).filter(_.nonEmpty).map(b => t < to_timestamp(lit(b)))
      ).flatten
      val p = preds.reduceOption(_ && _).getOrElse(lit(true))
      refine(shape, df, p, intersect)
    }
    def line = s"filter_date(after=$after, before=$before, intersect=$intersect)"
  }

  /** P10 — point selection by id list (edit_service.py:169-184). */
  final case class SelectPoints(idCol: String, ids: Seq[Long])
      extends EditAction {
    ident("idCol", idCol)
    def apply(shape: Shape, df: DataFrame): DataFrame =
      refine(shape, df, col(idCol).isin(ids: _*), intersect = false)
    def line = s"select_points(idCol=$idCol, ids=${ids.mkString(";")})"
  }

  /** F10/M4 — arithmetic update on the selection
    * (change_value, edit_service.py:233-256).
    */
  final case class ChangeValue(op: String, operand: Double)
      extends EditAction {
    require(Set("+", "-", "*", "=")(op), s"bad op $op")
    def apply(shape: Shape, df: DataFrame): DataFrame = {
      val v = col(shape.value)
      val updated = op match {
        case "+" => v + operand
        case "-" => v - operand
        case "*" => v * operand
        case "=" => lit(operand)
      }
      df.withColumn(shape.value,
        when(sel(shape), updated).otherwise(v))
    }
    def line = s"change_value(op=$op, operand=$operand)"
  }

  /** M2 — delete the selected points (edit_service.py:265-277). */
  final case class DeleteSelected() extends EditAction {
    def apply(shape: Shape, df: DataFrame): DataFrame =
      df.filter(!sel(shape))
    def line = "delete_selected()"
  }

  /** W4 — interpolate the selection between its non-selected neighbors
    * (edit_service.py:279-309).
    */
  final case class Interpolate() extends EditAction {
    def apply(shape: Shape, df: DataFrame): DataFrame = {
      // same working-column discipline as EditOps.driftCorrectRuns:
      // a silent withColumn+drop would clobber then LOSE a user
      // column of this name
      require(!df.columns.contains("__interp"),
        "interpolate: the frame already has a __interp column — " +
          "rename it; the action needs the name as working space")
      EditOps.interpolate(df, shape.keys, shape.ts, shape.tiebreak,
          shape.value, sel(shape), "__interp")
        .withColumn(shape.value, col("__interp")).drop("__interp")
    }
    def line = "interpolate()"
  }

  /** W5 — drift-correct each selected run (edit_service.py:311-339). */
  final case class DriftCorrect(gradient: Double) extends EditAction {
    def apply(shape: Shape, df: DataFrame): DataFrame = {
      require(!df.columns.contains("__drift"),
        "drift_correct: the frame already has a __drift column — " +
          "rename it; the action needs the name as working space")
      EditOps.driftCorrectRuns(df, shape.keys, shape.ts, shape.tiebreak,
          shape.value, sel(shape), gradient, "__drift")
        .withColumn(shape.value, col("__drift")).drop("__drift")
    }
    def line = s"drift_correct(gradient=$gradient)"
  }

  /** F11 — assign a qualifier flag to the selection
    * (edit_service.py:362-365).
    */
  final case class FlagSelected(flagCol: String, flag: Long)
      extends EditAction {
    ident("flagCol", flagCol)
    def apply(shape: Shape, df: DataFrame): DataFrame =
      df.withColumn(flagCol,
        when(sel(shape), lit(flag))
          .otherwise(if (df.columns.contains(flagCol)) col(flagCol)
            else lit(null).cast("long")))
    def line = s"flag_selected(flagCol=$flagCol, flag=$flag)"
  }

  /** F12 — global re-key of an identity column
    * (edit_service.py:375-391).
    */
  final case class Rekey(keyCol: String, newValue: Long) extends EditAction {
    ident("keyCol", keyCol)
    def apply(shape: Shape, df: DataFrame): DataFrame =
      df.withColumn(keyCol, lit(newValue))
    def line = s"rekey(keyCol=$keyCol, newValue=$newValue)"
  }

  /** Serialize a log: shape header + one line per action — same idea as
    * the reference's write_header + per-call lines
    * (record_service.py:169-175).
    */
  def serialize(shape: Shape, actions: Seq[EditAction]): String = {
    val header = s"# graft edit log v1\n" +
      s"shape(keys=${shape.keys.mkString(";")}, ts=${shape.ts}, " +
      s"tiebreak=${shape.tiebreak}, value=${shape.value}, " +
      s"selected=${shape.selected})"
    (header +: actions.map(_.line)).mkString("\n") + "\n"
  }

  private val Call = """(\w+)\((.*)\)""".r

  private def args(s: String): Map[String, String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      k.trim -> v.trim
    }.toMap

  /** Parse a serialized log back into (shape, actions). Inverse of
    * [[serialize]] — `parse(serialize(s, a)) == (s, a)`.
    */
  def parse(text: String): (Shape, Seq[EditAction]) = {
    val lines = text.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#")).toSeq
    val shape = lines.head match {
      case Call("shape", a) =>
        val m = args(a)
        // filter empties so a keyless (single-series) session's
        // `keys=` round-trips to Nil instead of Seq("") — which the
        // Shape ident check would reject at replay time
        Shape(m("keys").split(";").toSeq.filter(_.nonEmpty),
          m("ts"), m("tiebreak"), m("value"), m("selected"))
      case other => sys.error(s"expected shape header, got: $other")
    }
    val actions = lines.tail.map {
      case Call(name, a) =>
        val m = args(a)
        name match {
          case "filter_value" => FilterValue(m("op"), m("v").toDouble,
            m("intersect").toBoolean)
          case "filter_date" => FilterDate(m.getOrElse("after", ""),
            m.getOrElse("before", ""), m("intersect").toBoolean)
          case "select_points" => SelectPoints(m("idCol"),
            m("ids").split(";").filter(_.nonEmpty).map(_.toLong).toSeq)
          case "change_value" => ChangeValue(m("op"), m("operand").toDouble)
          case "delete_selected" => DeleteSelected()
          case "interpolate" => Interpolate()
          case "drift_correct" => DriftCorrect(m("gradient").toDouble)
          case "flag_selected" => FlagSelected(m("flagCol"), m("flag").toLong)
          case "rekey" => Rekey(m("keyCol"), m("newValue").toLong)
          case other => sys.error(s"unknown action: $other")
        }
      case other => sys.error(s"unparseable line: $other")
    }
    (shape, actions)
  }

  /** Replay a log over a base frame (initializing the selection column
    * to all-false, as a fresh session does).
    */
  def replay(base: DataFrame, shape: Shape,
      actions: Seq[EditAction]): DataFrame =
    actions.foldLeft(base.withColumn(shape.selected, lit(false))) {
      (df, a) => a(shape, df)
    }
}
