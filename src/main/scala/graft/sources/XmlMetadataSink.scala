package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** XML metadata export — the reference emits a nested series-metadata
  * document per published dataset (reference: export_series_metadata +
  * append_* helpers, src/GAMUTRawData/odmservices/export_service.py:
  * 120-389). The document is driver-side by nature: it describes the
  * small dimension values of one series, not the fact rows, so there is
  * no distributed work — dims are collected (broadcast-sized) and
  * serialized here.
  */
object XmlMetadataSink {

  /** A metadata node: element name, attributes, text, children. */
  final case class Node(name: String,
      attrs: Seq[(String, String)] = Nil,
      text: Option[String] = None,
      children: Seq[Node] = Nil)

  def escape(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    .replace("\"", "&quot;").replace("'", "&apos;")

  def render(n: Node, indent: Int = 0): String = {
    val pad = "  " * indent
    val attrs = n.attrs.map { case (k, v) => s""" $k="${escape(v)}"""" }
      .mkString
    (n.text, n.children) match {
      case (Some(t), Nil) =>
        s"$pad<${n.name}$attrs>${escape(t)}</${n.name}>"
      case (None, Nil) => s"$pad<${n.name}$attrs/>"
      case (_, kids) =>
        val inner = kids.map(render(_, indent + 1)).mkString("\n")
        val textPart = n.text.map(t => s"\n$pad  ${escape(t)}").getOrElse("")
        s"$pad<${n.name}$attrs>$textPart\n$inner\n$pad</${n.name}>"
    }
  }

  /** Series metadata document shaped like the reference's: a root with
    * site / variable / method / source sections built from collected dim
    * values.
    */
  def seriesMetadata(series: Map[String, String],
      sections: Seq[(String, Map[String, String])]): Node =
    Node("SeriesMetadata",
      attrs = series.toSeq.sortBy(_._1),
      children = sections.map { case (name, kvs) =>
        Node(name, children = kvs.toSeq.sortBy(_._1).map { case (k, v) =>
          Node(k, text = Some(v))
        })
      })

  /** One series' values for the reference-fidelity export: leaf values
    * keyed by slash path under DataSeries (e.g.
    * "SiteInformation/GeographicCoordinates/SRSID"), plus repeated
    * offset groups. Absent keys render as empty elements, matching the
    * reference's ElementTree behavior for None texts.
    */
  final case class SeriesXml(id: String, fields: Map[String, String],
      offsets: Seq[Map[String, String]] = Nil)

  /** The reference exporter's document, element-for-element in its
    * emission order (export_service.py: export_series_metadata :120-142,
    * append_general_info :155-171, append_site_info :173-222,
    * append_var_info :224-280, append_method_source_info :282-313,
    * append_misc_info :315-341):
    * Metadata → DataSeriesList[Total] → DataSeries[ID] →
    * { GeneralInformation, SiteInformation (Geographic/LocalCoordinates),
    *   VariableInformation (VariableUnits, TimeSupportUnits,
    *   PeriodOfRecord), MethodInformation, SourceInformation (Contact),
    *   QualityControlLevelInformation, OffsetInformation }.
    * MetadataCreationDate is a FIELD (caller-injected), not now(), so
    * the document is byte-stable and golden-testable.
    */
  def exportSeriesMetadata(series: Seq[SeriesXml]): Node =
    Node("Metadata", children = Seq(
      Node("DataSeriesList", attrs = Seq("Total" -> series.size.toString),
        children = series.map(dataSeriesNode))))

  private def dataSeriesNode(s: SeriesXml): Node = {
    def leaf(path: String): Node =
      Node(path.substring(path.lastIndexOf('/') + 1),
        text = s.fields.get(path))
    def leaves(prefix: String, names: String*): Seq[Node] =
      names.map(n => leaf(s"$prefix/$n"))
    val general = Node("GeneralInformation",
      children = leaves("GeneralInformation",
        "TopicCategory", "Title", "Abstract", "ProfileVersion",
        "MetadataLink", "MetadataCreationDate"))
    val site = Node("SiteInformation",
      children = leaves("SiteInformation", "SiteCode", "SiteName",
          "SiteType") ++ Seq(
        Node("GeographicCoordinates",
          children = leaves("SiteInformation/GeographicCoordinates",
            "Latitude", "Longitude", "SRSID", "SRSName", "IsGeographic",
            "Notes")),
        Node("LocalCoordinates",
          children = leaves("SiteInformation/LocalCoordinates",
            "LocalX", "LocalY", "SRSID", "SRSName", "IsGeographic",
            "Notes", "Elevation_m", "VerticalDatum"))) ++
        leaves("SiteInformation", "PosAccuracy_m", "State", "County",
          "Comments"))
    val variable = Node("VariableInformation",
      children = leaves("VariableInformation", "VariableCode",
          "VariableName", "Speciation") ++ Seq(
        Node("VariableUnits",
          children = leaves("VariableInformation/VariableUnits",
            "UnitsName", "UnitsType", "UnitsAbbreviation"))) ++
        leaves("VariableInformation", "SampleMedium", "ValueType",
          "IsRegular", "TimeSupport") ++ Seq(
        Node("TimeSupportUnits",
          children = leaves("VariableInformation/TimeSupportUnits",
            "UnitsName", "UnitsType", "UnitsAbbreviation"))) ++
        leaves("VariableInformation", "DataType", "GeneralCategory",
          "NoDataValue") ++ Seq(
        Node("PeriodOfRecord",
          children = leaves("VariableInformation/PeriodOfRecord",
            "BeginDateTime", "EndDateTime", "BeginDateTimeUTC",
            "EndDateTimeUTC", "ValueCount"))))
    val method = Node("MethodInformation",
      children = leaves("MethodInformation", "MethodDescription",
        "MethodLink"))
    val source = Node("SourceInformation",
      children = leaves("SourceInformation", "Organization",
          "SourceDescription", "SourceLink") ++ Seq(
        Node("Contact",
          children = leaves("SourceInformation/Contact", "ContactName",
            "Phone", "Email", "Address", "City", "State", "ZipCode"))) ++
        leaves("SourceInformation", "Citation"))
    val qcl = Node("QualityControlLevelInformation",
      children = leaves("QualityControlLevelInformation",
        "QualityControlLevelCode", "Definition", "Explanation"))
    // offsets: flat repeated groups under one OffsetInformation node,
    // exactly the reference's loop shape (Offset[ID] + description +
    // nested units per offset, export_service.py:326-341)
    val offsets = Node("OffsetInformation",
      children = s.offsets.flatMap { o =>
        Seq(
          Node("Offset", attrs = Seq("ID" -> o.getOrElse("ID", ""))),
          Node("OffsetDescription", text = o.get("OffsetDescription")),
          Node("OffsetUnits", children = Seq(
            Node("UnitsName", text = o.get("UnitsName")),
            Node("UnitsType", text = o.get("UnitsType")))))
      })
    Node("DataSeries", attrs = Seq("ID" -> s.id),
      children = Seq(general, site, variable, method, source, qcl,
        offsets))
  }

  def write(doc: Node, path: String): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p,
      ("""<?xml version="1.0" encoding="UTF-8"?>""" + "\n" +
        render(doc) + "\n").getBytes(StandardCharsets.UTF_8))
  }
}
