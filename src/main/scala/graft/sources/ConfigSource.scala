package graft.io

import org.apache.spark.sql.SparkSession

/** Driver-side run configuration — the engine's answer to the
  * reference's jsonpickle settings file (connections, output rules,
  * selected series; reference: H2OService.LoadData,
  * src/Utilities/H2OServices.py:372-395 and the operations file saved
  * at :356-370).
  *
  * Config is data-plane-free: a small JSON document read on the driver
  * into case classes. `spark.read.json` (multiLine) does the parsing so
  * no JSON library dependency is needed.
  */
object ConfigSource {

  /** One selected series (the reference's H2OSeries 5-tuple,
    * src/Utilities/H2OSeries.py:22-51) plus chunking flags
    * (DetermineForcedSeriesChunking, H2OSeries.py:115-144).
    */
  final case class SeriesSelection(site: Long, variable: Long,
      method: Long, source: Long, qcLevel: Long) {
    /** The reference's surrogate string id (series.py:99-102). */
    def odmId: String = s"${site}_${variable}_${method}_${source}_$qcLevel"
  }

  final case class RunConfig(outputDir: String, singleFile: Boolean,
      chunkYears: Boolean, selections: Seq[SeriesSelection])

  def load(spark: SparkSession, path: String): RunConfig = {
    val df = spark.read.option("multiLine", "true").json(path)
    val row = df.head()
    // fail fast on null/absent fields: a bare getAs[Long] UNBOXES a
    // null to 0L (and getAs[Boolean] to false), so a config with one
    // malformed selection would silently select series id 0 or flip
    // the output mode instead of rejecting the file
    def req[T](r: org.apache.spark.sql.Row, n: String): T = {
      val i = r.fieldIndex(n)
      require(!r.isNullAt(i), s"config $path: field '$n' is null/absent")
      r.getAs[T](i)
    }
    val sels = req[scala.collection.Seq[org.apache.spark.sql.Row]](
      row, "selections").map { r =>
      SeriesSelection(req[Long](r, "site"), req[Long](r, "variable"),
        req[Long](r, "method"), req[Long](r, "source"),
        req[Long](r, "qcLevel"))
    }.toSeq
    RunConfig(req[String](row, "outputDir"), req[Boolean](row, "singleFile"),
      req[Boolean](row, "chunkYears"), sels)
  }
}
