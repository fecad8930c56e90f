package graft.io

import org.apache.spark.sql.{DataFrame, DataFrameReader, SaveMode, SparkSession}

/** JDBC source/sink wiring — the engine's answer to the reference's
  * dialect-switched SQLAlchemy connections (reference:
  * src/GAMUTRawData/odmservices/service_manager.py:121-171) and its
  * bulk value append (save_values,
  * src/GAMUTRawData/odmservices/series_service.py:746-752).
  *
  * Scale design: reads declare `partitionColumn/lowerBound/upperBound/
  * numPartitions` so the scan fans out across executors instead of the
  * reference's single bulk `read_sql_query` (which it guards with a
  * 250k-row chunk constant and an `except MemoryError`,
  * series_service.py:436-443). Predicates and projections push into the
  * remote query via Catalyst's JDBC pushdown. There is no DELETE/UPDATE
  * pushdown in Spark — mutation write-back stays a driver-side JDBC
  * statement by design (SURVEY.md §7.5 risk 8).
  */
object JdbcIO {

  /** Supported engine dialects, mirroring the reference's four. */
  sealed trait Dialect { def url(host: String, db: String): String }
  case object Postgres extends Dialect {
    def url(h: String, db: String) = s"jdbc:postgresql://$h/$db"
  }
  case object MySql extends Dialect {
    def url(h: String, db: String) = s"jdbc:mysql://$h/$db"
  }
  case object SqlServer extends Dialect {
    def url(h: String, db: String) =
      s"jdbc:sqlserver://$h;databaseName=$db"
  }
  case object Sqlite extends Dialect {
    def url(h: String, db: String) = s"jdbc:sqlite:$db"
  }
  /** Embedded file-backed dialect (the reference's SQLite role — its
    * edit sessions materialize into an embedded DB, edit_service.py:
    * 32-48). Also the round-trip test dialect: Derby ships with Spark,
    * so S1/S2/K5 execute against a real database in `sbt test`.
    */
  case object Derby extends Dialect {
    def url(h: String, db: String) = s"jdbc:derby:$db;create=true"
  }
  /** Second embedded file-backed dialect (DuckDB) so the round-trip
    * contract is executed against two REAL engines with different
    * type/quoting behavior, not one — the same role SQLite plays for
    * the reference's edit sessions (edit_service.py:32-48): a
    * server-less, in-process database addressed by file path.
    */
  case object DuckDb extends Dialect {
    def url(h: String, db: String) = s"jdbc:duckdb:$db"
  }

  /** Catalyst-side dialect hook for DuckDB URLs. Spark 4's
    * `JdbcUtils.tableExists` probes with `SELECT 1 FROM t WHERE 1=0`
    * and RETHROWS any SQLException it cannot classify as
    * object-not-found; DuckDB's driver reports missing tables as a
    * generic SQLException with no SQLState, so without this hook
    * `SaveMode.Append` on a fresh table fails instead of creating it.
    * Registered once at [[JdbcIO]] load (idempotent); no DuckDB classes
    * are referenced — the shipped library still depends only on Spark.
    */
  private object DuckDbSparkDialect
      extends org.apache.spark.sql.jdbc.JdbcDialect {
    override def canHandle(url: String): Boolean =
      url.startsWith("jdbc:duckdb:")
    // match the TABLE/VIEW-not-found messages specifically ("Catalog
    // Error: Table with name t does not exist!") — a bare
    // "does not exist" also matches missing SCHEMAS and COLUMNS, which
    // would send SaveMode.Append down the CREATE TABLE path and bury
    // the real error under a misleading create failure
    override def isObjectNotFoundException(e: java.sql.SQLException): Boolean =
      Option(e.getMessage).exists(m =>
        m.contains("does not exist") &&
          (m.contains("Table with name") || m.contains("View with name")))
  }
  org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(DuckDbSparkDialect)

  final case class Conn(dialect: Dialect, host: String, db: String,
      user: String = "", password: String = "") {
    def url: String = dialect.url(host, db)
  }

  /** S1/S2 — table or pushdown-query scan. `partitionOn` enables the
    * parallel range-partitioned read.
    */
  def read(spark: SparkSession, conn: Conn, table: String,
      partitionOn: Option[(String, Long, Long, Int)] = None): DataFrameReader = {
    val base = spark.read.format("jdbc")
      .option("url", conn.url)
      .option("dbtable", table)
      .option("user", conn.user)
      .option("password", conn.password)
    partitionOn.fold(base) { case (colName, lo, hi, n) =>
      base.option("partitionColumn", colName)
        .option("lowerBound", lo).option("upperBound", hi)
        .option("numPartitions", n)
    }
  }

  /** Scan-path retry, the upload Retry's twin — the reference retries
    * its value query once on timeout (series_service.py:444-451).
    * Wraps an arbitrary scan materialization so callers can guard any
    * driver-side remote step; transient failures (timeouts, transient
    * SQL states) retry, everything else rethrows immediately.
    * Executor-side task failures are Spark's own retry domain
    * (`spark.task.maxFailures`) — this policy covers the DRIVER's
    * remote metadata/connection step, where the reference's timeout
    * fired.
    */
  def scanWithRetry[T](retries: Int = 1)(scan: => T): T =
    Retry.withRetry(retries)(scan)

  /** [[read]] + `load()` under [[scanWithRetry]]: the driver-side
    * schema-resolution query (a real remote round trip) is retried on
    * transient failure before the DataFrame is returned.
    */
  def readWithRetry(spark: SparkSession, conn: Conn, table: String,
      partitionOn: Option[(String, Long, Long, Int)] = None,
      retries: Int = 1): DataFrame =
    scanWithRetry(retries)(read(spark, conn, table, partitionOn).load())

  /** M3 — mutation write-back: DELETE against the external database,
    * the reference's delete_series / delete_values_by_series /
    * delete_dvs (series_service.py:885-937). Spark has no
    * DELETE/UPDATE pushdown, and these statements address dim-scale
    * row sets (one series, one date range), so a single driver-side
    * JDBC statement is the right shape at any scale — the database
    * does the work; nothing streams through Spark. Returns the number
    * of affected rows.
    *
    * `predicate` is a TEMPLATE with `?` placeholders; data-derived
    * values go in `binds` and are bound through PreparedStatement —
    * never interpolated into the SQL (quoting bugs and injection both
    * die here). Column identifiers in the template must be quoted as
    * the writer created them (Spark's JDBC writer emits
    * case-sensitive quoted columns).
    */
  def deleteWhere(conn: Conn, table: String, predicate: String,
      binds: Seq[Any] = Seq.empty): Int =
    execUpdate(conn, s"DELETE FROM $table WHERE $predicate", binds)

  /** Driver-side DML/DDL with `?`-placeholder binds (see
    * [[deleteWhere]]).
    */
  def execUpdate(conn: Conn, sql: String, binds: Seq[Any] = Seq.empty): Int = {
    val c = java.sql.DriverManager.getConnection(conn.url, conn.user,
      conn.password)
    try {
      val st = c.prepareStatement(sql)
      try {
        binds.zipWithIndex.foreach { case (v, i) =>
          st.setObject(i + 1, v)
        }
        st.executeUpdate()
      } finally st.close()
    } finally c.close()
  }

  /** K5 — bulk append (the reference's to_sql(if_exists='append')).
    * Creates the table on first write. `options` passes writer options
    * such as `createTableColumnTypes` (e.g. VARCHAR instead of the
    * dialect's CLOB default, which some engines can't filter on).
    */
  def append(df: DataFrame, conn: Conn, table: String,
      options: Map[String, String] = Map.empty): Unit =
    df.write.format("jdbc")
      .option("url", conn.url)
      .option("dbtable", table)
      .option("user", conn.user)
      .option("password", conn.password)
      .options(options)
      .mode(SaveMode.Append)
      .save()
}
