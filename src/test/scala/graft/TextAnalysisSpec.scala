package graft

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("misraGries honors est <= exact and exact - est <= N/(k+1) on skewed data") {
    val rnd = new scala.util.Random(7)
    // Zipf-ish: key i gets ~N/i occurrences, shuffled
    val keys = rnd.shuffle(
      (1 to 40).flatMap(i => Seq.fill(4000 / i)(s"k$i")): Seq[String])
    val n = keys.size
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (k <- Seq(5, 16); parts <- Seq(1, 7)) {
      val est = TextAnalysis.misraGries(
        spark.createDataset(keys).repartition(parts), k)
        .as[(String, Long)].collect().toMap
      val bound = n.toDouble / (k + 1)
      exact.foreach { case (w, ex) =>
        val e = est.getOrElse(w, 0L)
        assert(e <= ex, s"k=$k parts=$parts $w: est $e overcounts exact $ex")
        assert(ex - e <= bound, s"k=$k parts=$parts $w: undercount ${ex - e} > $bound")
      }
      // no spurious keys
      assert(est.keySet.subsetOf(exact.keySet))
    }
  }
}
