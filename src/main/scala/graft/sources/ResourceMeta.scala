package graft.io

/** F7 — driver-side regex parsing of resource metadata strings
  * (reference: OdmSeriesHelper.RE_RESOURCE_PARSER,
  * src/Utilities/H2OSeries.py:58 — `'Title (ID xyz)'`; coverage-period
  * regex `start=...end=...scheme=...`,
  * src/Utilities/HydroShareUtility.py:199-200, consumed at :474-490).
  * Config-plane parsing, so plain Scala — the data plane's regex
  * operators (`regexp_extract` etc.) remain in TextOps.
  */
object ResourceMeta {

  final case class ResourceTitle(title: String, id: String)
  final case class CoveragePeriod(start: String, end: String, scheme: String)

  /** `'Some Title (ID abc123)'` → title + id. Lazy title match so a
    * parenthesized suffix inside the title doesn't shift the ID group.
    */
  private val TitleRe = """(?i)^(.+?)\s+\(ID (\w+)\)$""".r

  def parseTitle(s: String): Option[ResourceTitle] = s match {
    case TitleRe(t, id) => Some(ResourceTitle(t, id))
    case _ => None
  }

  /** `start=2020-01-01T00:00:00; end=2020-12-31T23:59:59; scheme=W3C`
    * (the reference tolerates any 2 chars between fields).
    */
  private val PeriodRe =
    ("""(?i)^start=([0-9-]{10}T[0-9:]{8}).{2}""" +
      """end=([0-9-]{10}T[0-9:]{8}).{2}scheme=(.+)$""").r

  def parseCoverage(s: String): Option[CoveragePeriod] = s match {
    case PeriodRe(a, b, sch) => Some(CoveragePeriod(a, b, sch))
    case _ => None
  }
}

/** Driver-level query retry policy (reference: retry-once-on-timeout,
  * src/GAMUTRawData/odmservices/series_service.py:444-451; the declared
  * DATAVALUES_TIMEOUT/SERIES_TIMEOUT constants, src/Common.py:61-63).
  * Generic: retries on the given retryable predicate, rethrows
  * non-retryable failures immediately, gives up after `retries`.
  */
object Retry {
  def withRetry[T](retries: Int = 1,
      retryable: Throwable => Boolean = defaultRetryable)(f: => T): T = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case e: Throwable if retryable(e) && attempt < retries =>
          attempt += 1
      }
    }
    sys.error("unreachable")
  }

  /** Timeouts and transient connectivity, the reference's retry
    * cases. Walks the CAUSE CHAIN: a JDBC driver surfaces a connect/
    * read timeout as its own SQLException subclass with the
    * SocketTimeoutException underneath (and Spark's load() may wrap
    * once more) — classifying only the top-level throwable would
    * make the one retry the reference requires never fire.
    */
  def defaultRetryable(e: Throwable): Boolean = {
    var t = e
    var depth = 0
    while (t != null && depth < 16) {
      t match {
        case _: java.util.concurrent.TimeoutException => return true
        case _: java.net.SocketTimeoutException => return true
        case _: java.sql.SQLTransientException => return true
        case _ => ()
      }
      t = t.getCause
      depth += 1
    }
    false
  }
}
