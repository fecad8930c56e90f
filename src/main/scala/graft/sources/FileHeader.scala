package graft.io

/** Reference-shaped CSV metadata header builder
  * (reference: BuildSeriesFileHeader + section helpers,
  * src/Utilities/DatasetUtilities.py:420-534, 595-738): a `# `-commented
  * block with Site Information, Variable and Method Information
  * (expanded for a single series, one compact `|`-joined row per column
  * for multi-series files), Source Information, optional fixed Censor
  * Codes block, and Qualifier Codes.
  *
  * Format notes carried over faithfully:
  *  - key/value lines end with a space before the newline
  *    (`'# {}: {} \n'`, DatasetUtilities.py:683);
  *  - a value containing a comma wraps the whole line in quotes
  *    (DatasetUtilities.py:680-681);
  *  - integral NoDataValue prints as an integer (F6,
  *    DatasetUtilities.py:642);
  *  - absent values print as `None` (Python `str(None)`).
  *
  * Two reference quirks are deliberately NOT replicated (both are
  * clear defects): the compact row's `[:-2]` truncation of the final
  * MethodLink cell (meant to strip an ` \n` suffix that compact lines
  * don't have, DatasetUtilities.py:727) and `method.link[-1:]` keeping
  * ONLY the last character when the link ends in a non-alphanumeric
  * (meant to DROP that character, :706-707 vs :649-650). We strip the
  * trailing non-alphanumeric, as the expanded path does.
  */
object FileHeader {

  final case class UnitInfo(name: String, unitType: String,
      abbreviation: String)

  final case class VarInfo(code: String, name: String, valueType: String,
      dataType: String, generalCategory: String, sampleMedium: String,
      units: UnitInfo, noDataValue: Double, timeSupport: Double,
      timeUnits: UnitInfo)

  final case class MethodInfo(id: Int, description: String,
      link: Option[String])

  final case class SiteInfo(code: String, name: String, latitude: Double,
      longitude: Double, latLonDatum: String, elevationM: Option[Double],
      elevationDatum: Option[String], state: Option[String],
      county: Option[String], comments: Option[String],
      siteType: Option[String])

  final case class SourceDetails(organization: String,
      description: String, link: Option[String], contactName: String,
      phone: String, email: String, citation: String)

  /** Marks the ONE field the reference int-renders when whole —
    * `int(no_data_value) if no_data_value.is_integer()`
    * (DatasetUtilities.py:642). Every other Double prints like
    * Python's `str(float)`: a whole elevation stays "1414.0", a whole
    * TimeSupport stays "0.0" — applying the int() quirk to them (the
    * old behavior) byte-diverged those header lines from the
    * reference's.
    */
  private final case class IntWhole(d: Double)

  private def pyStr(v: Any): String = v match {
    case None => "None"
    case Some(x) => pyStr(x)
    // Python's int() is arbitrary precision, so a huge whole sentinel
    // (1e20) prints its exact integer; toLong would silently SATURATE
    // to Long.MaxValue, hence BigDecimal
    case IntWhole(d) => if (d.isWhole)
      BigDecimal(d).toBigIntExact.map(_.toString).getOrElse(d.toString)
      else d.toString
    case d: Double => d.toString
    case x => x.toString
  }

  /** `# Title: value ` line; quoted whole-line when the value holds a
    * comma.
    */
  def line(title: String, value: Any): String = {
    val v = pyStr(value)
    if (v.contains(",")) s""""# $title: $v"""" + "\n"
    else s"# $title: $v \n"
  }

  private val Rule = "# ----------------------------------\n"

  /** Byte-faithful to the reference's `generateSiteInformation`
    * (DatasetUtilities.py:498-511), which — unlike `formatHelper`
    * (the [[line]] twin used by the variable/method/source sections)
    * — writes NO trailing space and never comma-quotes. The two
    * formats are intentionally different in the reference; do not
    * "unify" this section onto [[line]].
    */
  def siteSection(s: SiteInfo): String =
    "# Site Information\n" + Rule +
      s"# SiteCode: ${pyStr(s.code)}\n" +
      s"# SiteName: ${pyStr(s.name)}\n" +
      s"# Latitude: ${s.latitude}\n" +
      s"# Longitude: ${s.longitude}\n" +
      s"# LatLonDatum: ${pyStr(s.latLonDatum)}\n" +
      s"# Elevation_m: ${pyStr(s.elevationM)}\n" +
      s"# ElevationDatum: ${pyStr(s.elevationDatum)}\n" +
      s"# State: ${pyStr(s.state)}\n" +
      s"# County: ${pyStr(s.county)}\n" +
      s"# Comments: ${pyStr(s.comments)}\n" +
      s"# SiteType: ${pyStr(s.siteType)}\n" +
      "#\n"

  private def cleanLink(m: MethodInfo): String = {
    val l = m.link.getOrElse("None")
    if (l.nonEmpty && !l.last.isLetterOrDigit) l.init else l
  }

  private def varFields(v: VarInfo): Seq[(String, Any)] = Seq(
    "VariableCode" -> v.code, "VariableName" -> v.name,
    "ValueType" -> v.valueType, "DataType" -> v.dataType,
    "GeneralCategory" -> v.generalCategory,
    "SampleMedium" -> v.sampleMedium,
    "VariableUnitsName" -> v.units.name,
    "VariableUnitsType" -> v.units.unitType,
    "VariableUnitsAbbreviation" -> v.units.abbreviation,
    "NoDataValue" -> v.noDataValue,
    "TimeSupport" -> v.timeSupport,
    "TimeSupportUnitsAbbreviation" -> v.timeUnits.abbreviation,
    "TimeSupportUnitsName" -> v.timeUnits.name,
    "TimeSupportUnitsType" -> v.timeUnits.unitType)

  /** Single-series expanded section (ExpandedVariableData). The
    * int()-when-whole NoDataValue quirk applies ONLY here
    * (DatasetUtilities.py:642) — the reference's COMPACT formatter
    * prints the raw float (line 719), so the wrap happens at this
    * call site, not in [[varFields]].
    */
  def expandedVariableSection(v: VarInfo, m: MethodInfo): String =
    "# Variable and Method Information\n" + Rule +
      (varFields(v).map {
        case ("NoDataValue", _) =>
          "NoDataValue" -> (IntWhole(v.noDataValue): Any)
        case kv => kv
      } ++ Seq[(String, Any)](
        "MethodDescription" -> m.description,
        "MethodLink" -> cleanLink(m)))
        .map { case (t, x) => line(t, x) }.mkString

  /** Multi-series compact section (CompactVariableData): one quoted
    * `|`-joined row per wide column.
    */
  def compactVariableSection(
      cols: Seq[(String, VarInfo, MethodInfo)]): String = {
    val rows = cols.map { case (colName, v, m) =>
      val cells = Seq(s"Column: $colName") ++
        (varFields(v).take(2) ++ Seq[(String, Any)]("MethodID" -> m.id) ++
          varFields(v).drop(2) ++ Seq[(String, Any)](
          "MethodDescription" -> m.description,
          "MethodLink" -> cleanLink(m)))
          .map { case (t, x) => s"$t: ${pyStr(x)}" }
      "\"# " + cells.mkString(" | ") + "\""
    }
    "# Variable and Method Information\n" + Rule +
      rows.mkString("\n") + "\n"
  }

  def sourceSection(s: SourceDetails): String =
    "# Source Information\n" + Rule +
      Seq("Organization" -> s.organization,
        "SourceDescription" -> s.description,
        "SourceLink" -> pyStr(s.link),
        "ContactName" -> s.contactName,
        "Phone" -> s.phone, "Email" -> s.email,
        "Citation" -> s.citation)
        .map { case (t, v) => line(t, v) }.mkString

  val censorCodesSection: String =
    "# Censor Codes\n" + Rule + "# nc: not censored\n#\n"

  def qualifierCodesSection(codes: Seq[(String, String)]): String =
    if (codes.isEmpty) ""
    else "# Qualifier Codes\n" + Rule +
      codes.map { case (abrv, defn) => s"# $abrv: $defn\n" }.mkString +
      "#\n"

  /** Full header composition (BuildSeriesFileHeader): expanded form for
    * one series, compact for many.
    */
  def build(cols: Seq[(String, VarInfo, MethodInfo)], site: SiteInfo,
      source: SourceDetails, qualifierCodes: Seq[(String, String)] = Nil,
      hasCensorCodes: Boolean = false): String = {
    val varData = cols match {
      case Seq((_, v, m)) => expandedVariableSection(v, m)
      case many => compactVariableSection(many)
    }
    // trailing '#\n' is appended unconditionally after the qualifier
    // block, exactly as the reference does (DatasetUtilities.py:466)
    siteSection(site) +
      varData + "#\n" +
      sourceSection(source) + "#\n" +
      (if (hasCensorCodes) censorCodesSection else "") +
      qualifierCodesSection(qualifierCodes) + "#\n"
  }
}
