package graft

import org.apache.spark.sql.functions._

import graft.operators.DataOps

class DataOpsSpec extends SparkSpec {
  import spark.implicits._

  test("checksumOf is row-order-invariant and value-sensitive") {
    val rows = (1L to 200L).map(i => (i, s"name_$i"))
    def sum(data: Seq[(Long, String)], parts: Int): (Long, Long) = {
      val df = spark.createDataset(data).toDF("id", "name").repartition(parts)
      val r = DataOps.checksumOf("t", df, concat_ws("|", col("id"), col("name")))
        .head()
      (r.getAs[Long]("n_rows"), r.getAs[Long]("checksum"))
    }
    val base = sum(rows, 1)
    assert(sum(rows.reverse, 7) === base, "shuffled layout must not change the checksum")
    val mutated = rows.updated(57, (58L, "name_58_CORRUPT"))
    assert(sum(mutated, 1)._2 !== base._2, "a one-row change must flip the checksum")
  }

  test("diffSnapshots classifies insert/delete/update and drops unchanged rows") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v")
    val b = Seq((2L, "y"), (3L, "z2"), (4L, "w")).toDF("k", "v")
    val got = DataOps.diffSnapshots(a, b, "k", "v")
      .select("k", "change").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "delete", 3L -> "update", 4L -> "insert"))
  }

  test("outliersOf flags exactly the planted outliers, per group") {
    // group "a": tight cluster around 10 plus one wild point; group "b":
    // same shape at a different scale — per-group stats must localize both
    val base = (1 to 99).map(i => (i.toLong, "a", 10.0 + (i % 3) * 0.01)) ++
      (101 to 199).map(i => (i.toLong, "b", 500.0 + (i % 5) * 0.1))
    val data = base ++ Seq((100L, "a", 99.0), (200L, "b", 9999.0))
    val df = spark.createDataset(data).toDF("id", "grp", "v")
    val got = DataOps.outliersOf(df, "grp", col("v"), Seq(col("id")), 3.0)
      .select("id").as[Long].collect().toSet
    assert(got === Set(100L, 200L))
  }

  test("madOutliersOf flags the planted point and survives contamination outliersOf misses") {
    // Group "a": grid 1000..1004 (mad = 1) plus one wild point. Group "b":
    // FIFTEEN wild points — past the z-score breakdown point (a cluster of
    // k > n/10 identical outliers has z ≈ √((n−k)/k) < 3, so the moment
    // screen swallows its own target), while med/mad barely move.
    val a = (1 to 99).map(i => (i.toLong, "a", 1000L + (i % 5))) :+ (100L, "a", 999999L)
    val b = (101 to 185).map(i => (i.toLong, "b", 2000L + (i % 5))) ++
      (186 to 200).map(i => (i.toLong, "b", 5000000L))
    val df = spark.createDataset(a ++ b).toDF("event_id", "grp", "cents")
    val got = DataOps.madOutliersOf(df, "grp", 3.0)
      .select("event_id").as[Long].collect().toSet
    assert(got === ((186L to 200L).toSet + 100L))
    // contamination check: the 5-point cluster drags the z-score screen
    // under threshold for at least one planted point MAD still catches
    val z = DataOps.outliersOf(df, "grp", col("cents"), Seq(col("event_id")), 3.0)
      .select("event_id").as[Long].collect().toSet
    assert((got -- z).nonEmpty, "MAD should catch points z-score misses here")
  }

  test("casOrphans: with all-unique payloads, orphans are exactly the retired docs") {
    // precondition at sf0.001: no duplicate texts, so every digest has one
    // referrer and the orphan set must equal the % 10 == 0 delete set.
    val docs = graft.sources.Tables.documents(spark, sf)
    val dupTexts = docs.groupBy(md5(col("text"))).count().filter(col("count") > 1).count()
    assert(dupTexts === 0L, "test precondition: sf0.001 corpus has unique texts")
    val retired = docs.filter(col("doc_id") % 10 === 0)
      .agg(count(lit(1)), sum(length(col("text")).cast("long")))
      .as[(Long, Long)].head()
    val got = graft.operators.Multimodal.casOrphans(spark, sf)
      .agg(sum("n_orphans"), sum("reclaimed_bytes")).as[(Long, Long)].head()
    assert(got === retired)
  }

  test("fkAudit counts orphan rows/keys and null FKs on a planted violation") {
    val child = Seq(
      (1L, Option(10L)), (2L, Option(10L)), (3L, Option(20L)),
      (4L, Option(99L)), (5L, Option(99L)), (6L, Option(77L)),
      (7L, None)).toDF("id", "fk")
    val parent = Seq(10L, 20L, 30L).toDF("pk")
    val r = DataOps.fkAudit("child.fk->parent", child, "fk", parent, "pk").head()
    assert(r.getAs[Long]("child_rows") === 7L)
    assert(r.getAs[Long]("null_keys") === 1L)
    assert(r.getAs[Long]("orphan_rows") === 3L, "rows with fk in {99,99,77}")
    assert(r.getAs[Long]("orphan_keys") === 2L, "distinct orphan keys {99,77}")
  }

  test("skewReportOf profiles a planted hot key with deterministic tie-break") {
    val data = Seq.fill(90)("hot") ++ (1 to 10).map(i => s"k$i") ++ Seq(null, null)
    val df = data.toDF("k")
    val r = DataOps.skewReportOf("t.k", df, col("k")).head()
    assert(r.getAs[Long]("total_rows") === 100L, "nulls excluded")
    assert(r.getAs[Long]("ndv") === 11L)
    assert(r.getAs[Long]("max_cnt") === 90L)
    assert(r.getAs[String]("max_key") === "hot")
    assert(r.getAs[Long]("top_share_ppm") === 900000L)
    // tie on max_cnt resolves to the smallest key string
    val tied = (Seq.fill(5)("b") ++ Seq.fill(5)("a") ++ Seq("c")).toDF("k")
    val t = DataOps.skewReportOf("t.k", tied, col("k")).head()
    assert(t.getAs[String]("max_key") === "a")
  }
}
