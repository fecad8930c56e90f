package graft

import graft.io.FileHeader
import graft.io.FileHeader._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-string tests for the reference-shaped CSV metadata header
  * (format: BuildSeriesFileHeader, DatasetUtilities.py:420-534).
  */
class FileHeaderSpec extends AnyFunSuite {

  private val site = SiteInfo("LR_WaterLab_AA", "Logan River at WaterLab",
    41.7436, -111.7956, "WGS84", Some(1414.0), Some("NAVD88"),
    Some("Utah"), Some("Cache"), None, Some("Stream"))

  private val cUnit = UnitInfo("degree celsius", "Temperature", "degC")
  private val tUnit = UnitInfo("second", "Time", "s")

  private val temp = VarInfo("WaterTemp_EXO", "Temperature, water",
    "Field Observation", "Continuous", "Water Quality", "Surface water",
    cUnit, -9999.0, 0.0, tUnit)

  private val method = MethodInfo(5, "Measured with an EXO2 sonde",
    Some("http://example.org/exo2/"))

  private val source = SourceDetails("Utah Water Research Lab",
    "Continuous aquatic monitoring", Some("http://example.org"),
    "Jane Doe", "555-0100", "jane@example.org",
    "Doe et al. (2020), Aquatic data")

  test("expanded single-series header matches reference format") {
    val h = FileHeader.build(
      Seq(("WaterTemp_EXO", temp, method)), site, source,
      qualifierCodes = Seq("ICE" -> "Ice affected"),
      hasCensorCodes = true)
    val expected =
      """# Site Information
        |# ----------------------------------
        |# SiteCode: LR_WaterLab_AA
        |# SiteName: Logan River at WaterLab
        |# Latitude: 41.7436
        |# Longitude: -111.7956
        |# LatLonDatum: WGS84
        |# Elevation_m: 1414.0
        |# ElevationDatum: NAVD88
        |# State: Utah
        |# County: Cache
        |# Comments: None
        |# SiteType: Stream
        |#
        |# Variable and Method Information
        |# ----------------------------------
        |""".stripMargin
    assert(h.startsWith(expected), h.take(600))
    // key/value lines keep the reference's trailing space
    assert(h.contains("# VariableCode: WaterTemp_EXO \n"))
    // integral sentinel prints as integer; key lines keep the
    // reference's trailing space
    assert(h.contains("# NoDataValue: -9999 \n"))
    // the link's trailing slash (non-alphanumeric) is stripped
    assert(h.contains("# MethodLink: http://example.org/exo2 \n"))
    // comma-holding values wrap the whole line in quotes
    assert(h.contains("\"# Citation: Doe et al. (2020), Aquatic data\"\n"))
    assert(h.contains("# Censor Codes\n"))
    assert(h.contains("# ICE: Ice affected\n"))
    assert(h.endsWith("#\n"))
  }

  test("compact multi-series header renders one piped row per column") {
    val ph = temp.copy(code = "pH_EXO", name = "pH")
    val h = FileHeader.build(
      Seq(("WaterTemp_EXO-5", temp, method), ("pH_EXO-5", ph, method)),
      site, source)
    assert(h.contains(
      "\"# Column: WaterTemp_EXO-5 | VariableCode: WaterTemp_EXO | " +
        "VariableName: Temperature, water | MethodID: 5 | "))
    assert(h.contains("\"# Column: pH_EXO-5 | VariableCode: pH_EXO | "))
    // exactly two compact rows
    assert(h.linesIterator.count(_.startsWith("\"# Column:")) === 2)
    // the compact formatter prints the RAW float NoDataValue — the
    // int()-when-whole quirk belongs to the EXPANDED section only
    // (DatasetUtilities.py:642 vs 719)
    assert(h.contains("NoDataValue: -9999.0 | "))
  }
}
