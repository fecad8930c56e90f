package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Text-analysis inventory over the `documents` table: token counting,
  * quality scoring, language ID, fingerprinting, n-gram profiles.
  * All per-row (no shuffle except the final aggregations) and fully
  * codegen'd — at 100 TB these scale with input splits only.
  */
object TextQueries {
  import Tables._

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // t1: token counting — whitespace tokens + BPE-ish subword splits.
    "t1_tokens" -> ((s, d) =>
      documents(s, d).select(
        col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("ws_tokens"),
        size(TextOps.bpeTokens(col("text"))).cast("long").as("bpe_tokens"),
        length(col("text")).cast("long").as("chars"))),

    // t2: quality scoring — length/punct/stopword/letter ratios folded
    // into one bounded score. Ratios are plain double arithmetic (IEEE
    // deterministic, same expression shape as the oracle).
    "t2_quality" -> ((s, d) => {
      val toks = TextOps.tokens(col("text"))
      val nTok = size(toks).cast("double")
      val chars = length(col("text")).cast("double")
      // WsChars, not Java \s: the oracle's RE2 \s excludes \x0B, so
      // the two engines must agree on what counts as whitespace here
      val punct = length(regexp_replace(col("text"),
          s"[A-Za-z0-9${TextOps.WsChars}]", ""))
        .cast("double")
      val stops = TextOps.markerCount(toks,
        Seq("the", "a", "of", "and", "is", "to", "in")).cast("double")
      val punctRatio = punct / chars
      val stopRatio = stops / nTok
      val quality = least(lit(1.0), nTok / lit(100.0)) *
        (lit(1.0) - punctRatio) * (lit(1.0) - lit(0.5) * stopRatio)
      // floor(x*1e4 + 0.5)/1e4, not round(x, 4): engine round() on a
      // raw double diverges at .xxxx5 boundaries (Spark rounds the
      // shortest decimal repr HALF_UP, DuckDB the raw binary), while
      // the floor idiom is pure IEEE ops both engines compute
      // bit-identically (non-negative ratios, so floor(x+0.5) is
      // exactly half-up)
      def r4(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        floor(c * lit(10000.0) + lit(0.5)) / 10000.0
      documents(s, d).select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        r4(punctRatio).as("punct_ratio"),
        r4(stopRatio).as("stop_ratio"),
        r4(quality).as("quality"))
    }),

    // t3: language ID — stopword-marker n-gram heuristic with exact
    // integer scores and deterministic argmax tiebreak (en>de>es>fr).
    "t3_lang_id" -> ((s, d) => {
      val toks = TextOps.tokens(lower(col("text")))
      val scores = TextOps.LangMarkers.map { case (lang, ws) =>
        lang -> TextOps.markerCount(toks, ws)
      }
      val withScores = documents(s, d).select(
        col("doc_id") +: col("lang") +:
          scores.map { case (l, c) => c.as(s"s_$l") }: _*)
      val pred = TextOps.langPred(
        TextOps.LangMarkers.map { case (l, _) => l -> col(s"s_$l") })
      withScores.select(
        col("doc_id"), col("s_en"), col("s_de"), col("s_es"), col("s_fr"),
        pred.as("lang_pred"),
        (pred === col("lang")).as("label_match"))
    }),

    // t4: document fingerprinting — md5-based 60-bit content hash of the
    // normalized text plus a Rabin–Karp rolling hash of the raw chars.
    "t4_fingerprint" -> ((s, d) =>
      documents(s, d)
        .withColumn("norm", TextOps.normalize(col("text")))
        .select(
          col("doc_id"),
          TextOps.hash15(col("norm")).as("fp"),
          TextOps.rollingHash("text").as("rolling_fp"))),

    // t5: char-trigram profile — distinct n-gram count per doc and a
    // corpus-level aggregation by language. avg_tri is an ARITHMETIC
    // round over the exact integer sum (floor(sum*1e4/n + 0.5)/1e4):
    // engine round() over a raw double average is the exact cross-engine
    // trap NOTES.md playbook rule 2 exists for (and it bit here in r2).
    "t5_trigram_profile" -> ((s, d) =>
      documents(s, d)
        .select(col("lang"),
          TextOps.distinctNgramCount("text", 3).as("n_tri"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("docs"),
          sum(col("n_tri")).as("sum_tri"))
        .select(col("lang"), col("docs"), col("sum_tri"),
          (floor(col("sum_tri") * lit(10000.0) / col("docs") + lit(0.5))
            / lit(10000.0)).as("avg_tri"))),

    // t7: repetition-ratio quality signal (Gopher-style filter rule):
    // the share of all word 2-grams taken by the single most frequent
    // one — high ratio = boilerplate/degenerate text. Integer max/total
    // per doc are exact; the ratio uses arithmetic rounding (playbook
    // rule 2). Docs with <2 tokens have no 2-grams and drop out on both
    // engines (explode/unnest of an empty list).
    "t7_repetition" -> ((s, d) => {
      // explode_outer + null-drop, NOT plain explode: the non-outer
      // generate lets InferFiltersFromGenerate push a size()>0 filter
      // to the scan with the shingle tree inlined (re-tokenizing per
      // gram slot — the d10 trap, 2x here). The isNotNull filter sits
      // ABOVE the generate (its attribute is generator output), so the
      // scan stays cheap; gram-less docs drop exactly as with explode.
      // Grams leave the row as native 60-bit shingle hashes (t10's
      // form): only counts are reported, and the hash is engine-
      // identical, so the per-gram groupBy keys match the oracle's
      // hashed grams exactly — the gram string never materializes.
      val grams = documents(s, d)
        .withColumn("__toks", TextOps.tokens(col("text")))
        .select(col("doc_id"),
          explode_outer(expr("shingle_hashes(__toks, 2, 0)")).as("sh"))
        .where(col("sh").isNotNull)
      grams.groupBy(col("doc_id"), col("sh"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("doc_id"))
        .agg(max(col("n")).as("top_gram"),
          sum(col("n")).as("total_grams"))
        .select(col("doc_id"), col("top_gram"), col("total_grams"),
          (floor(col("top_gram") * lit(10000.0) / col("total_grams")
            + lit(0.5)) / lit(10000.0)).as("rep_ratio"))
    }),

    // t8: PII-style redaction — digit runs and email-shaped tokens
    // replaced by placeholders, with REDACTION counts (placeholders
    // inserted — a digit run inside an already-redacted email counts
    // as part of that email, not separately) and a fingerprint of the
    // redacted text. The native `redact_pii` kernel does the whole
    // thing in ONE byte pass (the composed form ran two java.regex
    // passes per document, each with per-match StringBuilder churn);
    // its email automaton replays the regex's leftmost-first greedy
    // semantics exactly (property-spec'd against the composed form,
    // and the DuckDB oracle still runs the regexes). The oracle uses
    // the regex subset Java and RE2 agree on; the placeholder tokens
    // cannot arise from redaction itself (no digits, no '@').
    "t8_redact" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"), expr("redact_pii(text)").as("__r"))
        .select(
          col("doc_id"),
          col("__r.n_emails").as("n_emails"),
          col("__r.n_nums").as("n_nums"),
          TextOps.hash15(col("__r.redacted")).as("redacted_fp"))),

    // t9: Count-Min-sketch token frequencies — the fixed-memory scale
    // path for vocabulary counting (typed Aggregator, map-side merge;
    // exact counts shuffle the whole vocabulary, the sketch ships
    // d·w longs per partition). Probing the five English stopword
    // markers; the oracle rebuilds the identical sketch cells in SQL,
    // so estimates are hash-compared bit-exactly, and the CMS
    // no-undercount guarantee is asserted as a column.
    "t9_cms_freq" -> ((s, d) => {
      import graft.functions.CountMinSketch
      import graft.operators.DedupOps.MinHashP
      val (dd, ww) = (4, 64)
      val probes = Seq("the", "a", "of", "and", "is")
      val toks = documents(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("tok"))
        .withColumn("bh", TextOps.hash15(col("tok")) % MinHashP)
      val sketch = toks.agg(CountMinSketch(dd, ww)(col("bh")).as("sk"))
      val exact = toks.filter(col("tok").isin(probes: _*))
        .groupBy(col("tok")).agg(count(lit(1)).as("exact"))
      import s.implicits._
      probes.toDF("token")
        .crossJoin(broadcast(sketch))
        .withColumn("bh", TextOps.hash15(col("token")) % MinHashP)
        .select(col("token"),
          CountMinSketch.estimate(col("sk"), col("bh"), dd, ww).as("est"))
        .join(exact, col("token") === col("tok"), "left")
        .select(col("token"), col("est"),
          coalesce(col("exact"), lit(0L)).as("exact"),
          (col("est") >= coalesce(col("exact"), lit(0L)))
            .as("no_undercount"))
    }),

    // t10: duplicate-n-gram fraction — the share of each document's
    // word-3-gram OCCURRENCES whose gram also appears in at least one
    // other document (the Dolma/RefinedWeb-style "duplicate n-gram
    // fraction" quality signal: high fraction = boilerplate shared
    // across the corpus). Grams shuffle as 60-bit hashes, never as
    // strings — at 100 TB the shuffle key is 8 bytes, not the gram
    // text — and the corpus-level document frequency is a second
    // aggregation on the same key, so the whole signal is two
    // hash-partitioned aggregations plus one equi join; no all-pairs
    // anywhere. Ratio uses arithmetic rounding over exact integer
    // counts (playbook rule 2).
    "t10_dup_gram_frac" -> ((s, d) => {
      val grams = documents(s, d)
        .withColumn("__toks", TextOps.tokens(col("text")))
        .select(col("doc_id"),
          // native shingle_hashes (no mod): grams leave the row as
          // 60-bit hashes directly — the string shingle never
          // materializes. explode_outer + null-drop — the t7/d10
          // InferFilters guard
          explode_outer(expr("shingle_hashes(__toks, 3, 0)")).as("gh"))
        .where(col("gh").isNotNull)
        .select(col("doc_id"), col("gh"))
      val perDoc = grams.groupBy(col("doc_id"), col("gh"))
        .agg(count(lit(1)).as("n"))
      val docFreq = perDoc.groupBy(col("gh"))
        .agg(count(lit(1)).as("ndocs"))
      perDoc.join(docFreq, Seq("gh"))
        .groupBy(col("doc_id"))
        .agg(sum(col("n")).as("total_grams"),
          sum(when(col("ndocs") > 1, col("n")).otherwise(lit(0L)))
            .as("dup_grams"))
        .select(col("doc_id"), col("total_grams"), col("dup_grams"),
          (floor(col("dup_grams") * lit(10000.0) / col("total_grams")
            + lit(0.5)) / lit(10000.0)).as("dup_frac"))
    }),

    // t11: TF-IDF top terms per document — the classic
    // term-importance ranking, with an INTEGER idf surrogate
    // ((N·10^6) div df instead of ln(N/df)): engine ln()
    // implementations differ in the last ulp, an integer division
    // does not, so score and ranking are bit-identical across
    // engines while preserving the idf ordering (monotone in N/df).
    // tf and df are the same two hash-partitioned aggregations as
    // t10; the corpus size N is a 1-row broadcast.
    "t11_tfidf_top" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = documents(s, d)
      val nDocs = docs.agg(count(lit(1)).as("n_total"))
      val tf = docs
        .select(col("doc_id"),
          explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("token").asc)
      tf.join(dfreq, Seq("token"))
        .crossJoin(broadcast(nDocs))
        .withColumn("score", col("tf") * expr("(n_total * 1000000) div df"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("token"), col("tf"), col("df"),
          col("score"), col("rank"))
    }),

    // t6: corpus vocabulary — top-5 tokens per language by frequency
    // (explode → two-level aggregation → ranked window). The explode is
    // the engine's generator path; the token count is map-side
    // combinable before the shuffle on (lang, token).
    "t6_top_tokens" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val freq = documents(s, d)
        .select(col("lang"),
          explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("lang"), col("token"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n").desc, col("token").asc)
      freq.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
    })
  )

  private val duckToks = "regexp_split_to_array(trim(text), '\\s+')"
  private val duckToksLower =
    "regexp_split_to_array(trim(lower(text)), '\\s+')"

  private def duckMarker(toksSql: String, ws: Seq[String]): String =
    s"len(list_filter($toksSql, w -> w IN (${ws.map("'" + _ + "'").mkString(",")})))"

  def oracle: Map[String, String] = Map(
    "t1_tokens" ->
      s"""SELECT doc_id,
          len($duckToks) AS ws_tokens,
          len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))
            AS bpe_tokens,
          length(text) AS chars
          FROM documents""",
    "t2_quality" ->
      s"""WITH b AS (
            SELECT doc_id,
              CAST(len($duckToks) AS BIGINT) AS n_tokens,
              CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                   AS DOUBLE) / length(text) AS punct_ratio,
              CAST(${duckMarker(duckToks,
                Seq("the", "a", "of", "and", "is", "to", "in"))} AS DOUBLE)
                / len($duckToks) AS stop_ratio
            FROM documents)
          SELECT doc_id, n_tokens,
            floor(punct_ratio * 10000.0 + 0.5) / 10000.0 AS punct_ratio,
            floor(stop_ratio * 10000.0 + 0.5) / 10000.0 AS stop_ratio,
            floor(least(1.0, n_tokens / 100.0) * (1.0 - punct_ratio)
                  * (1.0 - 0.5 * stop_ratio) * 10000.0 + 0.5) / 10000.0
              AS quality
          FROM b""",
    "t3_lang_id" -> {
      val scores = TextOps.LangMarkers.map { case (l, ws) =>
        s"${duckMarker(duckToksLower, ws)} AS s_$l"
      }.mkString(", ")
      // same deterministic argmax: en wins ties, then de, then es.
      s"""WITH s AS (SELECT doc_id, lang, $scores FROM documents)
          SELECT doc_id, s_en, s_de, s_es, s_fr,
            CASE
              WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
              WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
              WHEN s_es >= s_fr THEN 'es'
              ELSE 'fr' END AS lang_pred,
            (CASE
              WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
              WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
              WHEN s_es >= s_fr THEN 'es'
              ELSE 'fr' END) = lang AS label_match
          FROM s"""
    },
    "t4_fingerprint" ->
      """WITH RECURSIVE n AS (
           SELECT doc_id, text, length(text) AS L,
             lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
           FROM documents),
         r AS (
           SELECT doc_id, text, L, 1 AS i,
             CAST(ascii(substr(text, 1, 1)) % 1000000007 AS BIGINT) AS h
           FROM n
           UNION ALL
           SELECT doc_id, text, L, i + 1,
             (h * 31 + ascii(substr(text, i + 1, 1))) % 1000000007
           FROM r WHERE i < L)
         -- LEFT join + L=0 case: an empty text has no terminal r row
         -- (the seed starts at i=1), but the engine's rolling_hash
         -- defines hash('') = 0 — an inner join would silently DROP
         -- empty documents from the oracle while Spark keeps them
         SELECT n.doc_id,
           ('0x' || substr(md5(n.norm), 1, 15))::BIGINT AS fp,
           CASE WHEN n.L = 0 THEN 0 ELSE r.h END AS rolling_fp
         FROM n LEFT JOIN r ON n.doc_id = r.doc_id AND r.i = n.L""",
    "t6_top_tokens" ->
      s"""WITH f AS (
            SELECT lang, unnest($duckToks) AS token FROM documents),
          c AS (
            SELECT lang, token, count(*) AS n FROM f GROUP BY lang, token),
          r AS (
            SELECT lang, token, n,
              CAST(row_number() OVER (PARTITION BY lang
                ORDER BY n DESC, token ASC) AS BIGINT) AS rank
            FROM c)
          SELECT lang, token, n, rank FROM r WHERE rank <= 5""",
    "t9_cms_freq" -> {
      import graft.operators.DedupOps.{minHashA, minHashB, MinHashP}
      val probes = Seq("the", "a", "of", "and", "is")
      val probeList = probes.map("'" + _ + "'").mkString(", ")
      def h15(x: String) = s"('0x' || substr(md5($x), 1, 15))::BIGINT"
      s"""WITH toks AS (
            SELECT unnest($duckToks) AS tok FROM documents),
          h AS (SELECT tok, ${h15("tok")} % $MinHashP AS bh FROM toks),
          cells AS (
            ${(0 until 4).map { r =>
              s"""SELECT $r AS r,
                  ((${minHashA(r)}*bh + ${minHashB(r)}) % $MinHashP) % 64
                    AS c,
                  count(*) AS n
                  FROM h GROUP BY 1, 2"""
            }.mkString(" UNION ALL ")}),
          probes AS (SELECT unnest([$probeList]) AS token),
          ph AS (SELECT token, ${h15("token")} % $MinHashP AS bh
                 FROM probes),
          pc AS (
            ${(0 until 4).map { r =>
              s"""SELECT token, $r AS r,
                  ((${minHashA(r)}*bh + ${minHashB(r)}) % $MinHashP) % 64
                    AS c
                  FROM ph"""
            }.mkString(" UNION ALL ")}),
          est AS (
            -- LEFT join: a probe cell the group-by never produced is an
            -- EMPTY cell (count 0), and the CMS min must see that zero
            SELECT pc.token, min(coalesce(cells.n, 0)) AS est
            FROM pc LEFT JOIN cells
              ON cells.r = pc.r AND cells.c = pc.c
            GROUP BY pc.token),
          exact AS (
            SELECT tok AS token, count(*) AS exact FROM toks
            WHERE tok IN ($probeList) GROUP BY tok)
          SELECT e.token, e.est,
            coalesce(x.exact, 0) AS exact,
            e.est >= coalesce(x.exact, 0) AS no_undercount
          FROM est e LEFT JOIN exact x USING (token)"""
    },
    "t7_repetition" ->
      s"""WITH t AS (
            SELECT doc_id, $duckToks AS toks FROM documents),
          g AS (
            SELECT doc_id,
              ('0x' || substr(md5(sh), 1, 15))::BIGINT AS sh
            FROM (
              SELECT doc_id,
                unnest(list_transform(
                  range(1, greatest(len(toks) - 1, 0) + 1),
                  i -> toks[i] || ' ' || toks[i+1])) AS sh
              FROM t)),
          c AS (
            SELECT doc_id, sh, count(*) AS n FROM g GROUP BY doc_id, sh)
          SELECT doc_id, max(n) AS top_gram,
            CAST(sum(n) AS BIGINT) AS total_grams,
            floor(max(n) * 10000.0 / sum(n) + 0.5) / 10000.0 AS rep_ratio
          FROM c GROUP BY doc_id""",
    "t8_redact" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val num = "[0-9]+"
      // n_nums counts digit runs in the EMAIL-REDACTED text — i.e.
      // redactions actually performed, matching the native kernel
      s"""WITH r AS (
            SELECT doc_id, text,
              regexp_replace(text, '$email', '<EMAIL>', 'g') AS t1
            FROM documents)
          SELECT doc_id,
            len(regexp_extract_all(text, '$email'))::BIGINT AS n_emails,
            len(regexp_extract_all(t1, '$num'))::BIGINT AS n_nums,
            ('0x' || substr(md5(
              regexp_replace(t1, '$num', '<NUM>', 'g')), 1, 15))::BIGINT
              AS redacted_fp
          FROM r"""
    },
    "t10_dup_gram_frac" ->
      s"""WITH t AS (
            SELECT doc_id, $duckToks AS toks FROM documents),
          g AS (
            SELECT doc_id,
              ('0x' || substr(md5(sh), 1, 15))::BIGINT AS gh
            FROM (
              SELECT doc_id,
                unnest(list_transform(
                  range(1, greatest(len(toks) - 2, 0) + 1),
                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                  AS sh
              FROM t)),
          pd AS (
            SELECT doc_id, gh, count(*) AS n FROM g GROUP BY doc_id, gh),
          df AS (
            SELECT gh, count(*) AS ndocs FROM pd GROUP BY gh)
          SELECT doc_id,
            CAST(sum(n) AS BIGINT) AS total_grams,
            CAST(sum(CASE WHEN ndocs > 1 THEN n ELSE 0 END) AS BIGINT)
              AS dup_grams,
            floor(sum(CASE WHEN ndocs > 1 THEN n ELSE 0 END)
              * 10000.0 / sum(n) + 0.5) / 10000.0 AS dup_frac
          FROM pd JOIN df USING (gh) GROUP BY doc_id""",
    "t11_tfidf_top" ->
      s"""WITH tf AS (
            SELECT doc_id, unnest($duckToks) AS token FROM documents),
          tfc AS (
            SELECT doc_id, token, count(*) AS tf FROM tf
            GROUP BY doc_id, token),
          dfc AS (
            SELECT token, count(*) AS df FROM tfc GROUP BY token),
          n AS (SELECT count(*) AS n_total FROM documents),
          s AS (
            SELECT tfc.doc_id, tfc.token, tfc.tf, dfc.df,
              tfc.tf * ((n.n_total * 1000000) // dfc.df) AS score
            FROM tfc JOIN dfc USING (token) CROSS JOIN n),
          r AS (
            SELECT doc_id, token, tf, df, score,
              CAST(row_number() OVER (PARTITION BY doc_id
                ORDER BY score DESC, token ASC) AS BIGINT) AS rank
            FROM s)
          SELECT doc_id, token, tf, df, score, rank
          FROM r WHERE rank <= 3""",
    "t5_trigram_profile" ->
      """WITH t AS (
           SELECT lang,
             CAST(len(list_distinct(
               list_transform(range(1, greatest(length(text) - 2, 0) + 1),
                              i -> substr(text, i, 3)))) AS BIGINT) AS n_tri
           FROM documents)
         SELECT lang, count(*) AS docs,
           CAST(sum(n_tri) AS BIGINT) AS sum_tri,
           floor(sum(n_tri) * 10000.0 / count(*) + 0.5) / 10000.0 AS avg_tri
         FROM t GROUP BY lang"""
  )
}
