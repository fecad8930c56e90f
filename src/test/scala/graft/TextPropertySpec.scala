package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{DedupOps, TextOps}

/** Property-based invariants for the text/dedup primitives, randomized
  * over generated corpora with fixed seeds (reproducible, no scalatest
  * bridge needed in the offline build).
  */
class TextPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val wordGen: Gen[String] =
    Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private val docGen: Gen[String] = for {
    n <- Gen.choose(0, 12)
    ws <- Gen.listOfN(n, wordGen)
  } yield ws.mkString(" ")

  test("shingle count is max(0, tokens - 2) and shingles are 3-token slices") {
    for (docs <- Seq(samples(docGen, 40))) {
      val rows = docs.filter(_.nonEmpty).toDF("text")
        .withColumn("toks", TextOps.tokens(col("text")))
        .select(col("text"), size(col("toks")).as("n"),
          TextOps.shinglesFromTokens(col("toks"), 3).as("sh"))
        .select(col("text"), col("n"), size(col("sh")).as("m"),
          col("sh"))
        .as[(String, Int, Int, Seq[String])].collect()
      rows.foreach { case (text, n, m, sh) =>
        assert(m === math.max(0, n - 2), s"text='$text'")
        val toks = text.trim.split("\\s+").toSeq
        sh.zipWithIndex.foreach { case (g, i) =>
          assert(g === toks.slice(i, i + 3).mkString(" "), s"text='$text'")
        }
      }
    }
  }

  test("char n-grams are distinct, n chars long, bounded by len-n+1") {
    for (docs <- Seq(samples(docGen, 40))) {
      val rows = docs.filter(_.length >= 4).toDF("text")
        .select(col("text"), TextOps.charNgrams("text", 4).as("g"))
        .as[(String, Seq[String])].collect()
      rows.foreach { case (text, g) =>
        assert(g.distinct === g, s"text='$text'")
        assert(g.forall(_.length == 4), s"text='$text'")
        assert(g.size <= text.length - 3, s"text='$text'")
      }
    }
  }

  test("jaccard is 1 on self, within [0,1], and symmetric") {
    val docs = samples(docGen, 30).filter(_.length >= 4).distinct
    val g = docs.toDF("text")
      .select(col("text"), TextOps.charNgrams("text", 4).as("g"))
    val a = g.select(col("text").as("ta"), col("g").as("ga"))
    val b = g.select(col("text").as("tb"), col("g").as("gb"))
    val pairs = a.crossJoin(b)
      .select(col("ta"), col("tb"),
        DedupOps.jaccard(col("ga"), col("gb")).as("j"))
      .as[(String, String, Double)].collect()
    pairs.foreach { case (ta, tb, j) =>
      assert(j >= 0.0 && j <= 1.0, s"'$ta' vs '$tb'")
      if (ta == tb) assert(j === 1.0, s"'$ta'")
    }
    val m = pairs.map { case (ta, tb, j) => (ta, tb) -> j }.toMap
    m.foreach { case ((ta, tb), j) => assert(m((tb, ta)) === j) }
  }

  test("minhash signature equals the min of per-shingle universal hashes") {
    val docs = samples(docGen, 25)
      .filter(_.trim.split("\\s+").count(_.nonEmpty) >= 3).distinct
    val k = 3
    val sig = DedupOps.withMinHash(docs.toDF("text"), "text", k)
      .select(col("text"), col("mh0"), col("mh1"), col("mh2"))
      .as[(String, Long, Long, Long)].collect()
    sig.foreach { case (text, mh0, mh1, mh2) =>
      val toks = text.trim.split("\\s+").toSeq
      val shingles = toks.sliding(3).map(_.mkString(" ")).toSeq
      val bases = shingles.map(sh =>
        graft.operators.MultimodalOps.hash15Jvm(sh.getBytes("UTF-8"))
          % DedupOps.MinHashP)
      def mh(i: Int) = bases.map(h =>
        (DedupOps.minHashA(i) * h + DedupOps.minHashB(i))
          % DedupOps.MinHashP).min
      assert((mh0, mh1, mh2) === (mh(0), mh(1), mh(2)), s"text='$text'")
    }
  }

  test("redact_pii equals the composed two-regex form on adversarial " +
      "strings") {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    def composed(s: String): String =
      s.replaceAll(email, "<EMAIL>").replaceAll("[0-9]+", "<NUM>")
    // counts = redactions PERFORMED (a literal placeholder already in
    // the input is not a redaction)
    def matches(s: String, re: String): Long = {
      val m = java.util.regex.Pattern.compile(re).matcher(s)
      var n = 0L
      while (m.find()) n += 1
      n
    }
    def counts(s: String): (Long, Long) =
      (matches(s, email),
        matches(s.replaceAll(email, "<EMAIL>"), "[0-9]+"))
    // alphabet dense in the pattern's structural characters so email
    // fragments, degenerate domains, adjacent runs, and multi-byte
    // characters all occur
    val charGen = Gen.frequency(
      6 -> Gen.alphaNumChar,
      3 -> Gen.oneOf('@', '.', '-', '_', '%', '+'),
      2 -> Gen.oneOf(' ', ',', '\n'),
      1 -> Gen.oneOf('é', '中', ' '))
    val strGen = Gen.choose(0, 40)
      .flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))
    val handPicked = Seq(
      "a@b.cc", "a@b.co.uk", "a@b..com", "a@.com", "ab@cd@ef.gh",
      "123a@b.cc456", "x1@y2.zz3", "a@b.c", "@x.com", "a@b,com",
      "a@b.cc.", "-a@-b-.cc-", "%+@%.++cc", "1@2.cc", "a@b.cécc",
      "é@b.cc", "a@é.cc", "<EMAIL>", "<NUM>", "a.b@c.d@e.ff",
      "9" * 30, ("a" * 20) + "@" + ("b." * 10) + "cc", "")
    val inputs = (handPicked ++ samples(strGen, 400)).distinct
    val got = inputs.toDF("text")
      .select(col("text"), expr("redact_pii(text)").as("r"))
      .select(col("text"), col("r.redacted"), col("r.n_emails"),
        col("r.n_nums"))
      .as[(String, String, Long, Long)].collect()
    got.foreach { case (text, red, ne, nn) =>
      assert(red === composed(text), s"text='$text'")
      assert((ne, nn) === counts(text), s"text='$text'")
    }
  }

  test("hash split is invariant under repartitioning") {
    val ids = (1L to 500L).toDF("doc_id")
    def split(parts: Int): Map[Long, String] = {
      val bucket = pmod(TextOps.hash15(
        concat(lit("split|"), col("doc_id"))), lit(100))
      ids.repartition(parts)
        .select(col("doc_id"),
          when(bucket < 80, "train").when(bucket < 90, "val")
            .otherwise("test").as("s"))
        .as[(Long, String)].collect().toMap
    }
    assert(split(1) === split(7))
  }
}
