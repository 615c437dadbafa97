package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class TextFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("tokenCount: whitespace tokens, empty → 0") {
    val r = Seq("a b  c", "", "  ", "one").toDF("t")
      .select(TextFunctions.tokenCount(col("t")).as("n")).as[Int].collect()
    assert(r.toSeq == Seq(3, 0, 0, 1))
  }

  test("wordNGrams: sliding n-grams; short text → empty") {
    val r = Seq("a b c d", "a b").toDF("t")
      .select(TextFunctions.wordNGrams(col("t"), 3).as("g"))
      .as[Seq[String]].collect()
    assert(r(0) == Seq("a b c", "b c d"))
    assert(r(1) == Seq.empty)
  }

  test("ngramRepetition kernel equals the declarative distinct-gram ratio") {
    val docs = Seq(
      "a b a b a b",            // grams: ab ba ab ba ab -> 2/5 distinct
      "w x y z",                // all distinct -> 0.0
      "", "   ", "solo",        // <2 tokens -> 0.0
      "t t t t t t t t"         // one distinct gram of 7 -> 6/7
    ).toDF("t")
    val toks = TextFunctions.tokens(col("t"))
    val grams = TextFunctions.wordNGrams(col("t"), 2)
    val r = docs.select(
      GraftFunctions.ngramRepetition(toks, 2).as("kernel"),
      when(size(grams) === 0, lit(0.0))
        .otherwise(lit(1.0) - size(array_distinct(grams)).cast("double")
          / size(grams).cast("double")).as("hof"))
      .as[(Double, Double)].collect()
    r.foreach { case (k, h) => assert(math.abs(k - h) < 1e-12, s"$k != $h") }
    assert(math.abs(r(0)._1 - 0.6) < 1e-12)
    assert(r(1)._1 == 0.0 && r(2)._1 == 0.0 && r(4)._1 == 0.0)
    assert(math.abs(r(5)._1 - 6.0 / 7.0) < 1e-12)
  }

  test("jaccard of token sets") {
    val df = Seq(("a b c", "b c d")).toDF("x", "y")
    val j = df.select(TextFunctions.jaccard(
      TextFunctions.tokenSet(col("x")), TextFunctions.tokenSet(col("y"))).as("j"))
      .as[Double].head()
    assert(j == 0.5)   // |{b,c}| / |{a,b,c,d}|
  }

  test("regexTokenCount splits letter/digit/punct runs") {
    val r = Seq("hello world42!", "a,b").toDF("t")
      .select(TextFunctions.regexTokenCount(col("t")).as("n")).as[Int].collect()
    assert(r.toSeq == Seq(4, 3))   // hello|world|42|! ; a|,|b
  }

  test("langId identifies real sentences by stopword profile") {
    val r = Seq(
      "the cat sat on a mat and it is warm in the sun",
      "der Hund ist nicht mit der Katze zu Hause und das ist gut",
      "el perro y el gato en la casa con un amigo por la tarde",
      "zzz qqq xxx www").toDF("t")
      .select(TextFunctions.langId(col("t")).as("l")).as[String].collect()
    assert(r.toSeq == Seq("en", "de", "es", "und"))
  }

  test("qualityScore is in [0,1] and rewards normal prose") {
    val r = Seq(
      "the quick brown fox jumps over a lazy dog and it runs far away today",
      "x").toDF("t")
      .select(TextFunctions.qualityScore(col("t")).as("q")).as[Double].collect()
    assert(r.forall(q => q >= 0.0 && q <= 1.0))
    assert(r(0) > r(1))
  }

  test("wordNGrams is linear in document length (50k-token doc)") {
    // Regression guard for the round-5 quadratic: the old formulation
    // re-evaluated the token split once per n-gram (O(len²)) — at 50k
    // tokens that's 2.5B re-splits and this test would hang, not fail.
    val n = 50000
    val doc = (0 until n).map(i => s"t${i % 997}").mkString(" ")
    val r = Seq(doc).toDF("t")
      .select(TextFunctions.wordNGrams(col("t"), 3).as("g"))
      .select(size(col("g")).as("k"),
        element_at(col("g"), 1).as("first"),
        element_at(col("g"), -1).as("last"))
      .as[(Int, String, String)].head()
    assert(r._1 == n - 2)
    assert(r._2 == "t0 t1 t2")
    assert(r._3 == s"t${(n - 3) % 997} t${(n - 2) % 997} t${(n - 1) % 997}")
  }

  test("regexTokenCount scanner ≡ the regex it replaces, incl. unicode") {
    // the SubwordCount byte scanner must count exactly what
    // size(regexp_extract_all(...)) counted — adversarial cases: empty,
    // all-space, run transitions, ASCII punctuation, non-ASCII letters
    // (one per code point, NOT per UTF-16 unit / UTF-8 byte), a
    // supplementary code point, non-ASCII whitespace (NBSP counts: java
    // \s is ASCII-only), and every ASCII \s char as a separator
    val cases = Seq(
      "", " ", "   \t\n\r\f ", "abc", "abc123", "a1b2",
      "hello, world!", "x-47.11%", "a  b", "ÄÖü", "naïve café",
      "日本語テスト", "emoji 😀 here", "a b",
      "AB12cd!!ef \t 34", "trailing space ", " leading",
      "mixed 中文 and english 123", "---", "a.b.c", "§±€",
      (0 until 500).map(i => s"w$i,").mkString(" "))
    val df = cases.toDF("t")
    val got = df.select(TextFunctions.regexTokenCount(col("t")))
      .as[Int].collect().toSeq
    val want = df.select(size(regexp_extract_all(col("t"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))))
      .as[Int].collect().toSeq
    assert(got == want, cases.zip(got.zip(want))
      .filter { case (_, (g, w)) => g != w }.toString)
  }

  test("regexTokenCount hand-computed known answers") {
    val r = Seq(("a1! b", 4), ("Hello世界", 3), ("", 0), ("  ", 0))
      .map(_._1).toDF("t")
      .select(TextFunctions.regexTokenCount(col("t"))).as[Int].collect()
    // "a1! b": [a][1][!][b]; "Hello世界": [Hello][世][界]
    assert(r.toSeq == Seq(4, 3, 0, 0))
  }
}
