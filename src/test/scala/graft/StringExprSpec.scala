package graft

import org.apache.spark.unsafe.types.UTF8String

import graft.plans.JaroWinklerAlgo

class StringExprSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinklerAlgo.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("JaroWinkler matches DuckDB jaro_winkler_similarity on pinned cases") {
    // expected values captured from DuckDB 1.0 jaro_winkler_similarity
    val cases = Seq(
      ("martha", "marhta", 0.9611111111),
      ("dixon", "dicksonx", 0.8133333333),
      ("jellyfish", "smellyfish", 0.8962962963),
      ("abc", "abc", 1.0),
      ("abc", "xyz", 0.0),
      ("a", "", 0.0),
      ("", "", 0.0),
      ("dwayne", "duane", 0.84),
      ("aaaaaabc", "aaaaaacb", 0.975), // prefix bonus capped at 4 chars
      ("ab", "ba", 0.0),               // window 0: no cross-position match
      ("abcdefgh", "hgfedcba", 0.5),
      ("abcdxx", "abyyyy", 0.5555555556), // jaro <= 0.7: no prefix bonus
      ("aqwert", "azxcvb", 0.4444444444),
      ("ab", "ac", 0.6666666667),
      ("abcd", "abzz", 0.6666666667),
      ("abc", "bca", 0.0),
      ("acb", "bac", 0.0),
    )
    cases.foreach { case (a, b, want) =>
      assert(math.abs(jw(a, b) - want) < 1e-9, s"jw($a, $b)")
    }
  }

  test("JaroWinkler is symmetric and bounded on random strings") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 500) {
      val a = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val x = jw(a, b)
      assert(x >= 0.0 && x <= 1.0)
      assert(math.abs(x - jw(b, a)) < 1e-12, s"asymmetric on ($a, $b)")
      if (a == b && a.nonEmpty) assert(x == 1.0)
    }
  }

  test("rolling_window_hashes: equality ≡ window-string equality; code points; edges") {
    import graft.plans.RollingWindowHashAlgo
    def hashes(s: String, k: Int): Seq[Long] =
      RollingWindowHashAlgo.compute(UTF8String.fromString(s), k).toLongArray().toSeq
    val k = 5
    // battery with verbatim repeats (within and across docs) and
    // multibyte code points — the roll must see characters, not bytes
    val docs = Seq("abcabcabcabcabc", "the quick fox the quick fox",
      "héllo wörld héllo wörld", "汉字文本流汉字文本流xyz",
      "aaaaaaaaaaaa", "abcdefghijkl")
    val all = docs.flatMap { d =>
      val cps = d.codePoints().toArray
      val h = hashes(d, k)
      assert(h.length == math.max(0, cps.length - k + 1), s"window count for '$d'")
      h.zipWithIndex.map { case (hv, i) => (new String(cps, i, k), hv) }
    }
    // same window string → same hash (the roll is position-independent)...
    all.groupBy(_._1).foreach { case (w, g) =>
      assert(g.map(_._2).distinct.size == 1, s"window '$w' hashed inconsistently")
    }
    // ...and distinct windows get distinct hashes on this battery
    // (collision-free in practice — the recurrence-set contract)
    assert(all.map(_._1).distinct.size == all.map(_._2).distinct.size)
    assert(all.forall(_._2 >= 0L), "63-bit mask must keep hashes non-negative")
    assert(hashes("abcd", 5).isEmpty, "string shorter than the window")
    assert(hashes("abcde", 5).size == 1)
    assert(hashes("", 5).isEmpty)
  }

  test("char_ngrams generator: code-point semantics, edge cases, SQL surface") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq(("hello", 1L), ("héllo", 2L), ("汉字文本流", 3L), ("ab", 4L), ("", 5L))
      .toDF("s", "id").createOrReplaceTempView("ng_t")
    val got = spark.sql(
      "SELECT id, gram FROM ng_t LATERAL VIEW char_ngrams(s, 3) t AS gram ORDER BY id, gram")
      .as[(Long, String)].collect().toSeq
    val want = Seq(
      1L -> "ell", 1L -> "hel", 1L -> "llo",          // ascii
      2L -> "hél", 2L -> "éll", 2L -> "llo",          // 2-byte é counts as ONE char
      3L -> "字文本", 3L -> "文本流", 3L -> "汉字文",  // 3-byte CJK
      // id 4 ("ab"): shorter than n → no rows; id 5 (""): no rows
    ).sortBy(p => (p._1, p._2))
    assert(got === want)
    // NULL input produces no rows, not a null row
    assert(spark.sql(
      "SELECT gram FROM (SELECT CAST(NULL AS STRING) AS s) LATERAL VIEW char_ngrams(s, 2) t AS gram")
      .count() === 0L)
    // agrees with the built-in explode-over-substrings formulation
    val doc = graft.sources.Tables.documents(spark, sf).select("text").limit(50)
    doc.createOrReplaceTempView("ng_docs")
    val viaUdtf = spark.sql(
      "SELECT gram, count(*) AS c FROM ng_docs LATERAL VIEW char_ngrams(text, 4) t AS gram GROUP BY gram")
    val viaBuiltin = spark.sql(
      """SELECT gram, count(*) AS c FROM (
        |  SELECT explode(transform(sequence(1, greatest(length(text) - 3, 0)),
        |    i -> substring(text, i, 4))) AS gram FROM ng_docs)
        |GROUP BY gram""".stripMargin)
    assert(viaUdtf.exceptAll(viaBuiltin).count() === 0L)
    assert(viaBuiltin.exceptAll(viaUdtf).count() === 0L)
  }
}
