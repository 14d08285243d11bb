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
}
