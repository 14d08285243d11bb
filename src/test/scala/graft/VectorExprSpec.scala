package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.plans.VectorExpressions._

class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  test("VectorDot matches the fold-based dot bit-exactly on real embeddings") {
    val e = graft.sources.Tables.embeddings(spark, sf).limit(50)
      .select(VectorFunctions.toDoubleVec($"embedding").as("v"))
    val both = e.select(
      vec_dot($"v", $"v").as("native"),
      VectorFunctions.dot($"v", $"v").as("fold"))
    assert(both.filter($"native" =!= $"fold").count() == 0)
  }

  test("vec_cosine matches fold cosine bit-exactly") {
    val e = graft.sources.Tables.embeddings(spark, sf).limit(20)
      .select($"vec_id", VectorFunctions.toDoubleVec($"embedding").as("v"))
    val pairs = e.as("a").crossJoin(e.as("b"))
    val diff = pairs.select(
      vec_cosine(col("a.v"), col("b.v")).as("n"),
      VectorFunctions.cosine(col("a.v"), col("b.v")).as("f"))
      .filter($"n" =!= $"f").count()
    assert(diff == 0)
  }

  test("HyperplaneBucket matches the fold-based lshBucket") {
    val e = graft.sources.Tables.embeddings(spark, sf).limit(100)
      .select(VectorFunctions.toDoubleVec($"embedding").as("v"))
    val diff = e.select(
      lsh_bucket($"v", 8, 64).as("n"),
      VectorFunctions.lshBucket($"v", 8, 64).as("f"))
      .filter($"n" =!= $"f").count()
    assert(diff == 0)
  }

  test("SortedIntersectCount equals size(array_intersect) on random sorted sets") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200) {
      def set() = Seq.fill(rnd.nextInt(60))(rnd.nextInt(80).toLong).distinct.sorted
      (set(), set())
    }
    val df = rows.toDF("a", "b")
    val diff = df.select(
      sorted_intersect_count($"a", $"b").as("n"),
      size(array_intersect($"a", $"b")).as("f"))
      .filter($"n" =!= $"f").count()
    assert(diff == 0)
  }

  test("SortedIntersectCount handles nulls and empties") {
    val df = Seq(
      (Some(Seq(1L, 2L, 3L)), Some(Seq(2L, 3L, 4L))),
      (Some(Seq.empty[Long]), Some(Seq(1L))),
      (None, Some(Seq(1L)))).toDF("a", "b")
    val got = df.select(sorted_intersect_count($"a", $"b").as("n")).collect()
    assert(got(0).getInt(0) == 2)
    assert(got(1).getInt(0) == 0)
    assert(got(2).isNullAt(0))
  }

  test("SortedIntersectCount refuses unsorted or duplicated input instead of undercounting") {
    // the consumers are dedup decisions: a silently undercounted
    // intersection is a silently missed duplicate pair, so the merge
    // scan enforces its strictly-ascending contract on every visited
    // element (both the codegen and interpreted paths)
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    for (bad <- Seq(Seq(3L, 1L, 5L), Seq(1L, 1L, 5L))) {
      val df = Seq((bad, Seq(1L, 5L))).toDF("a", "b")
      val e = intercept[Exception] {
        df.select(sorted_intersect_count($"a", $"b").as("n")).collect()
      }
      assert(msgs(e).exists(_.contains("not strictly ascending")), s"got: $e")
    }
    // tail elements past the shorter side's exhaustion are never visited
    // and cannot affect the count — documented contract boundary
    val ok = Seq((Seq(1L, 2L), Seq(1L, 2L, 9L, 3L))).toDF("a", "b")
      .select(sorted_intersect_count($"a", $"b").as("n")).head.getInt(0)
    assert(ok == 2)
  }

  test("VectorDot codegen handles nulls") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (None, Some(Seq(1.0, 1.0)))).toDF("a", "b")
    val got = df.select(vec_dot($"a", $"b").as("d")).collect()
    assert(got(0).getDouble(0) == 11.0)
    assert(got(1).isNullAt(0))
  }
}
