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

  def write(doc: Node, path: String): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p,
      ("""<?xml version="1.0" encoding="UTF-8"?>""" + "\n" +
        render(doc) + "\n").getBytes(StandardCharsets.UTF_8))
  }
}
