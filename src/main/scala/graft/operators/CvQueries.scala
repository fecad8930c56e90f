package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Controlled-vocabulary validation — the Spark mapping of the
  * reference's 11 CV tables and their lookup service (reference:
  * src/GAMUTRawData/odmservices/cv_service.py:32-134; table shape =
  * `(Term, Definition)` with Term as the key, e.g.
  * src/GAMUTRawData/odmdata/censor_code_cv.py:6-10).
  *
  * Spark-first design (SURVEY §1.5): every CV is a tiny dim frame, so
  * validation is a BROADCAST anti-join — the fact table is scanned
  * once, the vocabulary ships to every executor, and no shuffle of
  * fact data ever happens. At 100 TB this is the only viable shape:
  * the violations report aggregates map-side to |invalid terms| rows.
  * One report covers all vocabularies (the reference validates many
  * CV-typed columns through one service); each fact column is checked
  * against ITS vocabulary and the per-term violation counts union
  * into a single `(cv_name, term, n_rows)` frame.
  */
object CvQueries {
  import Tables._

  /** The blessed vocabularies, keyed by CV name — the analogue of the
    * reference's per-CV tables. `error` events and `zh` documents are
    * deliberately outside their vocabularies: like the reference's
    * CVs (a fixed authority the data may drift from), the validation
    * op must surface out-of-vocabulary terms, not assume they cannot
    * occur.
    */
  val terms: Seq[(String, String, String)] = Seq(
    ("event_type_cv", "click", "User activated a UI element"),
    ("event_type_cv", "view", "User viewed a page or item"),
    ("event_type_cv", "purchase", "User completed a purchase"),
    ("event_type_cv", "signup", "User created an account"),
    ("language_cv", "en", "English"),
    ("language_cv", "de", "German"),
    ("language_cv", "es", "Spanish"),
    ("language_cv", "fr", "French"))

  /** All CV tables as one `(cv_name, term, definition)` dim frame. */
  def cvTerms(s: SparkSession): DataFrame = {
    import s.implicits._
    terms.toDF("cv_name", "term", "definition")
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // cv1: out-of-vocabulary terms per CV with violation counts —
    // the data-plane validation the reference's GUI performs when it
    // edits qualifiers/CV-typed columns. NULL terms are out of scope
    // (SQL NULL means "not set", not "invalid term" — the reference's
    // optional FKs behave the same way).
    "cv1_violations" -> ((s, d) => {
      val cv = cvTerms(s)
      def violations(fact: DataFrame, termCol: String,
          cvName: String): DataFrame =
        fact.filter(col(termCol).isNotNull)
          .select(col(termCol).as("term"))
          .join(broadcast(cv.filter(col("cv_name") === cvName)
            .select(col("term"))), Seq("term"), "left_anti")
          .groupBy(col("term"))
          .agg(count(lit(1)).as("n_rows"))
          .select(lit(cvName).as("cv_name"), col("term"), col("n_rows"))
      violations(events(s, d), "event_type", "event_type_cv")
        .unionAll(violations(documents(s, d), "lang", "language_cv"))
    })
  )

  /** IN-lists are generated from [[terms]] so the oracle can never
    * drift from the frame the Spark side broadcasts.
    */
  def oracle: Map[String, String] = {
    def inList(cvName: String): String = terms
      .filter(_._1 == cvName).map(t => s"'${t._2}'").mkString(", ")
    Map(
      "cv1_violations" ->
        s"""SELECT 'event_type_cv' AS cv_name, event_type AS term,
              count(*) AS n_rows
            FROM events
            WHERE event_type IS NOT NULL
              AND event_type NOT IN (${inList("event_type_cv")})
            GROUP BY 2
            UNION ALL
            SELECT 'language_cv', lang, count(*)
            FROM documents
            WHERE lang IS NOT NULL AND lang NOT IN (${inList("language_cv")})
            GROUP BY 2""")
  }
}
