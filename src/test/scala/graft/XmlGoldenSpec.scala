package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.XmlMetadataSink._

/** K4 reference fidelity: the series-metadata export reproduces the
  * reference exporter's element tree element-for-element
  * (export_service.py:120-341) — pinned as a byte-stable golden file
  * (src/test/resources/k4_series_metadata.golden.xml) covering a fully
  * populated series (incl. escaping and an offset group) AND an
  * all-empty series (the reference's None-text elements). No Spark
  * session needed — the document is driver-side by design.
  */
class XmlGoldenSpec extends AnyFunSuite {

  private val fields = Seq(
    "GeneralInformation/TopicCategory" -> "inlandWaters",
    "GeneralInformation/Title" -> "Series 42 export",
    "GeneralInformation/Abstract" -> "Golden fixture",
    "GeneralInformation/ProfileVersion" -> "ISO 19115",
    "GeneralInformation/MetadataLink" -> "http://example.org/meta",
    "GeneralInformation/MetadataCreationDate" -> "7/1/2013 12:17:16 PM",
    "SiteInformation/SiteCode" -> "USU-LBR-Mendon",
    "SiteInformation/SiteName" -> "Little Bear River",
    "SiteInformation/SiteType" -> "Stream",
    "SiteInformation/GeographicCoordinates/Latitude" -> "41.718",
    "SiteInformation/GeographicCoordinates/Longitude" -> "-111.946",
    "SiteInformation/GeographicCoordinates/SRSID" -> "4269",
    "SiteInformation/GeographicCoordinates/SRSName" -> "NAD83",
    "SiteInformation/GeographicCoordinates/IsGeographic" -> "True",
    "SiteInformation/GeographicCoordinates/Notes" -> "",
    "SiteInformation/LocalCoordinates/LocalX" -> "0.0",
    "SiteInformation/LocalCoordinates/LocalY" -> "0.0",
    "SiteInformation/LocalCoordinates/SRSID" -> "0",
    "SiteInformation/LocalCoordinates/SRSName" -> "Unknown",
    "SiteInformation/LocalCoordinates/IsGeographic" -> "False",
    "SiteInformation/LocalCoordinates/Notes" -> "",
    "SiteInformation/LocalCoordinates/Elevation_m" -> "1345.0",
    "SiteInformation/LocalCoordinates/VerticalDatum" -> "2",
    "SiteInformation/PosAccuracy_m" -> "10.0",
    "SiteInformation/State" -> "Utah",
    "SiteInformation/County" -> "Cache",
    "SiteInformation/Comments" -> "<golden & fixture>",
    "VariableInformation/VariableCode" -> "USU36",
    "VariableInformation/VariableName" -> "Temperature",
    "VariableInformation/Speciation" -> "Not Applicable",
    "VariableInformation/VariableUnits/UnitsName" -> "degree celsius",
    "VariableInformation/VariableUnits/UnitsType" -> "Temperature",
    "VariableInformation/VariableUnits/UnitsAbbreviation" -> "degC",
    "VariableInformation/SampleMedium" -> "Surface Water",
    "VariableInformation/ValueType" -> "Field Observation",
    "VariableInformation/IsRegular" -> "True",
    "VariableInformation/TimeSupport" -> "30.0",
    "VariableInformation/TimeSupportUnits/UnitsName" -> "minute",
    "VariableInformation/TimeSupportUnits/UnitsType" -> "Time",
    "VariableInformation/TimeSupportUnits/UnitsAbbreviation" -> "min",
    "VariableInformation/DataType" -> "Average",
    "VariableInformation/GeneralCategory" -> "Water Quality",
    "VariableInformation/NoDataValue" -> "-9999.0",
    "VariableInformation/PeriodOfRecord/BeginDateTime" -> "1/1/2024 12:00:00 AM",
    "VariableInformation/PeriodOfRecord/EndDateTime" -> "1/31/2024 11:30:00 PM",
    "VariableInformation/PeriodOfRecord/BeginDateTimeUTC" -> "1/1/2024 7:00:00 AM",
    "VariableInformation/PeriodOfRecord/EndDateTimeUTC" -> "2/1/2024 6:30:00 AM",
    "VariableInformation/PeriodOfRecord/ValueCount" -> "1488",
    "MethodInformation/MethodDescription" -> "Autonomous sensing",
    "MethodInformation/MethodLink" -> "http://example.org/method",
    "SourceInformation/Organization" -> "Utah State University",
    "SourceInformation/SourceDescription" -> "Continuous monitoring",
    "SourceInformation/SourceLink" -> "http://example.org/source",
    "SourceInformation/Contact/ContactName" -> "Amber Spackman",
    "SourceInformation/Contact/Phone" -> "1-435-797-0045",
    "SourceInformation/Contact/Email" -> "amber.s@usu.edu",
    "SourceInformation/Contact/Address" -> "8200 Old Main Hill",
    "SourceInformation/Contact/City" -> "Logan",
    "SourceInformation/Contact/State" -> "UT",
    "SourceInformation/Contact/ZipCode" -> "84322",
    "SourceInformation/Citation" -> "Water Research Lab",
    "QualityControlLevelInformation/QualityControlLevelCode" -> "1",
    "QualityControlLevelInformation/Definition" -> "Quality controlled data",
    "QualityControlLevelInformation/Explanation" -> "Post-processed"
  ).toMap

  private val offsets = Seq(
    Map("ID" -> "1", "OffsetDescription" -> "Below water surface",
      "UnitsName" -> "meter", "UnitsType" -> "Length"))

  private lazy val rendered = render(exportSeriesMetadata(Seq(
    SeriesXml("42", fields, offsets),
    SeriesXml("43", Map.empty))))

  private lazy val golden = {
    val in = getClass.getResourceAsStream("/k4_series_metadata.golden.xml")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.stripLineEnd
    finally in.close()
  }

  test("K4 export is byte-identical to the pinned reference-shaped golden") {
    assert(rendered === golden)
  }

  test("K4 element inventory covers every reference exporter element") {
    // the full element vocabulary of export_service.py:120-341
    val referenceElements = Set(
      "Metadata", "DataSeriesList", "DataSeries",
      "GeneralInformation", "TopicCategory", "Title", "Abstract",
      "ProfileVersion", "MetadataLink", "MetadataCreationDate",
      "SiteInformation", "SiteCode", "SiteName", "SiteType",
      "GeographicCoordinates", "Latitude", "Longitude", "SRSID",
      "SRSName", "IsGeographic", "Notes", "LocalCoordinates", "LocalX",
      "LocalY", "Elevation_m", "VerticalDatum", "PosAccuracy_m",
      "State", "County", "Comments",
      "VariableInformation", "VariableCode", "VariableName",
      "Speciation", "VariableUnits", "UnitsName", "UnitsType",
      "UnitsAbbreviation", "SampleMedium", "ValueType", "IsRegular",
      "TimeSupport", "TimeSupportUnits", "DataType", "GeneralCategory",
      "NoDataValue", "PeriodOfRecord", "BeginDateTime", "EndDateTime",
      "BeginDateTimeUTC", "EndDateTimeUTC", "ValueCount",
      "MethodInformation", "MethodDescription", "MethodLink",
      "SourceInformation", "Organization", "SourceDescription",
      "SourceLink", "Contact", "ContactName", "Phone", "Email",
      "Address", "City", "ZipCode", "Citation",
      "QualityControlLevelInformation", "QualityControlLevelCode",
      "Definition", "Explanation",
      "OffsetInformation", "Offset", "OffsetDescription", "OffsetUnits")
    val emitted = "</?([A-Za-z_]+)[ />]".r
      .findAllMatchIn(rendered).map(_.group(1)).toSet
    val missing = referenceElements -- emitted
    assert(missing.isEmpty, s"reference elements not emitted: $missing")
  }
}
