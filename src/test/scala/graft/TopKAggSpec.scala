package graft

import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TopKAggregator, TopKItem}

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private val topk3 = udaf(new TopKAggregator(3), Encoders.product[TopKItem])

  test("topk aggregator equals the window formulation across partitionings") {
    val rnd = new scala.util.Random(11)
    // duplicate values on purpose so the id tie-break is exercised
    val rows = (1L to 500L).map(i => (s"g${i % 7}", (rnd.nextInt(40) / 4.0), i))
    for (parts <- Seq(1, 3, 16)) {
      val df = rows.toDF("g", "value", "id").repartition(parts)
      val viaAgg = df.groupBy("g")
        .agg(topk3($"value", $"id").as("top"))
        .select($"g", explode($"top.items").as("x"))
        .select($"g", $"x.value", $"x.id")
        .as[(String, Double, Long)].collect().toSet
      val w = Window.partitionBy("g").orderBy(desc("value"), asc("id"))
      val viaWindow = df.withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3).select($"g", $"value", $"id")
        .as[(String, Double, Long)].collect().toSet
      assert(viaAgg == viaWindow, s"parts=$parts")
    }
  }

  test("topk aggregator buffers never exceed k and stay sorted") {
    val agg = new TopKAggregator(2)
    val b = Seq(TopKItem(1.0, 5L), TopKItem(3.0, 1L), TopKItem(3.0, 2L),
      TopKItem(0.5, 9L)).foldLeft(agg.zero)(agg.reduce)
    assert(b.items == Seq(TopKItem(3.0, 1L), TopKItem(3.0, 2L)))
    val merged = agg.merge(b, TopKBufOf(TopKItem(4.0, 7L)))
    assert(merged.items == Seq(TopKItem(4.0, 7L), TopKItem(3.0, 1L)))
  }

  private def TopKBufOf(items: TopKItem*) = graft.functions.TopKBuf(items)

  test("topk aggregator is callable from SQL after registration") {
    spark.udf.register("topk3", topk3)
    Seq((1, 10.0, 100L), (1, 20.0, 101L), (1, 5.0, 102L), (1, 30.0, 103L))
      .toDF("g", "value", "id").createOrReplaceTempView("topk_in")
    val out = spark.sql(
      "SELECT g, topk3(value, id) AS top FROM topk_in GROUP BY g")
      .select(explode($"top.items").as("x")).select($"x.value", $"x.id")
      .as[(Double, Long)].collect().toSeq
    assert(out == Seq((30.0, 103L), (20.0, 101L), (10.0, 100L)))
  }
}
