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
    def str(n: String) = row.getAs[String](n)
    def bool(n: String) = row.getAs[Boolean](n)
    val sels = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]](
      "selections").map { r =>
      SeriesSelection(r.getAs[Long]("site"), r.getAs[Long]("variable"),
        r.getAs[Long]("method"), r.getAs[Long]("source"),
        r.getAs[Long]("qcLevel"))
    }.toSeq
    RunConfig(str("outputDir"), bool("singleFile"), bool("chunkYears"), sels)
  }
}
