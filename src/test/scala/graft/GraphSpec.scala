package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Scalar reference PageRank with the same semantics (uniform init,
    * dangling mass spread uniformly, fixed iterations). */
  private def refPagerank(edges: Seq[(String, String, Long)],
      damping: Double, iters: Int): Map[String, Double] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.length
    val outdeg = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.filterNot(outdeg.contains).map(r).sum
      val inc = edges.groupBy(_._2).view.mapValues(
        _.map(e => r(e._1) * e._3 / outdeg(e._1)).sum).toMap
      r = nodes.map(v => v ->
        ((1.0 - damping) / n + damping * (inc.getOrElse(v, 0.0) + dang / n))).toMap
    }
    r
  }

  test("pagerankOf matches a scalar reference on random weighted digraphs") {
    for (seed <- 0 until 3) {
      val rnd = new scala.util.Random(seed)
      val names = ('a' to 'h').map(_.toString)
      val edges = Seq.fill(6 + rnd.nextInt(12))(
        (names(rnd.nextInt(names.length)), names(rnd.nextInt(names.length)),
          1L + rnd.nextInt(5))).filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        val want = refPagerank(edges, 0.85, 10)
        val got = Graph.pagerankOf(edges.toDF("src", "dst", "w"), 0.85, 10)
          .as[(String, Double)].collect().toMap
        assert(got.keySet == want.keySet, s"seed=$seed")
        got.foreach { case (v, r) =>
          assert(math.abs(r - want(v)) < 1e-9, s"seed=$seed node=$v $r vs ${want(v)}")
        }
      }
    }
  }

  test("pagerank_events: ranks sum to 1 and are all positive") {
    val rows = Graph.pagerankEvents(spark, sf).as[(String, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 > 0))
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-4)
  }

  test("zorder_layout: zkey is the Morton interleave of the two bucket ids") {
    // scalar reference: recompute buckets + interleave per row
    val rows = graft.operators.Layout.zorderLayout(spark, sf)
      .as[(Long, Int)].collect()
    assert(rows.nonEmpty)
    val o = graft.sources.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_totalprice",
        floor(unix_micros($"o_orderdate".cast("timestamp")) / lit(86400000000L))
          .cast("double").as("day"))
      .as[(Long, Double, Double)].collect()
    val (minp, maxp) = (o.map(_._2).min, o.map(_._2).max)
    val (mind, maxd) = (o.map(_._3).min, o.map(_._3).max)
    def bkt(x: Double, lo: Double, hi: Double): Int =
      math.floor((x - lo) * 256 / (hi - lo + 1e-9)).toInt
    def morton(a: Int, b: Int): Int =
      (0 until 8).map(i => (((a >> i) & 1) << (2 * i)) | (((b >> i) & 1) << (2 * i + 1))).sum
    val want = o.map(r => r._1 -> morton(bkt(r._2, minp, maxp), bkt(r._3, mind, maxd))).toMap
    rows.foreach { case (k, z) => assert(z == want(k), s"order $k") }
    // both dimensions actually move the key: low bits track price buckets,
    // odd bits track date buckets
    assert(rows.map(_._2).distinct.length > 16)
  }

  test("ivf_purity: one row per cell, purity in (0,1], majority <= total") {
    val rows = graft.operators.Similarity.ivfPurity(spark, sf)
      .select($"cell", $"n", $"purity").as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.foreach { case (cell, n, p) =>
      assert(p > 0 && p <= 1.0, s"cell $cell purity $p")
      assert(n >= 1)
    }
  }

  test("trianglesOf enumerates each triangle once, from its smallest vertex") {
    // K4 on {1,2,3,4} (4 triangles) plus a pendant path 4-5-6 (0 triangles)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("id1", "id2")
    val got = Graph.trianglesOf(edges)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("trianglesOf on a triangle-free bipartite graph is empty") {
    val edges = (for { l <- 1L to 3L; r <- 10L to 12L } yield (l, r)).toDF("id1", "id2")
    assert(Graph.trianglesOf(edges).count() === 0L)
  }

  test("bfsLevels assigns shortest-path levels and ignores unreachable nodes") {
    // path 1-2-3-4 with shortcut 1-3, plus disconnected edge 10-11
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (10L, 11L))
      .toDF("id1", "id2")
    val got = Graph.bfsLevels(edges, source = 1L)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("ssspOf prefers a longer-hop cheaper path over the greedy direct edge") {
    // a->c direct costs 10; a->b->c costs 1+2=3 — fewer-hop BFS and
    // greedy nearest-neighbor both get this wrong, Bellman-Ford must not.
    // d is unreachable (only an out-edge to a) and must stay absent.
    val edges = Seq(("a", "c", 10L), ("a", "b", 1L), ("b", "c", 2L),
      ("c", "e", 1L), ("d", "a", 1L)).toDF("src", "dst", "w")
    val got = Graph.ssspOf(edges, "a", rounds = 4)
      .as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 0L, "b" -> 1L, "c" -> 3L, "e" -> 4L))
  }
}
