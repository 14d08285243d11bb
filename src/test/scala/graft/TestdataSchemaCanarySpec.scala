package graft

import org.apache.spark.sql.types.{DataType, TimestampNTZType, TimestampType}

import graft.sources.Tables

/** Whole-star-schema drift canary — the generalization of
  * EventsTsCanarySpec's lesson: the driver regenerates the testdata
  * between rounds, and a silent type change (events.ts TIMESTAMP(NANOS) →
  * micros-NTZ in round 10) once broke 22 queries at analysis time with
  * nothing in the diff. This spec pins every table's LOADED schema (i.e.
  * post-`Tables` normalization — events.ts must always land as µs
  * TimestampType no matter which physical shape shipped), so any future
  * regeneration that moves a column type fails ONE named test with a
  * readable diff instead of a fleet of queries.
  *
  * Date-like TPC-H columns (o_orderdate, l_shipdate) are accepted as
  * either TIMESTAMP or TIMESTAMP_NTZ: every consumer does date
  * arithmetic/truncation, which both types analyze under, and the driver
  * has shipped NTZ generations. Anything else — DATE, string, int — is
  * drift the queries have never run against, and should fail here.
  */
class TestdataSchemaCanarySpec extends SparkSpec {

  private def ts(t: DataType): Boolean = t == TimestampType || t == TimestampNTZType

  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double", "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string", "p_brand" -> "string",
      "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "ts", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int", "l_quantity" -> "double",
      "l_extendedprice" -> "double", "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string", "l_shipdate" -> "ts"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
      "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint", "embedding" -> "array<float>",
      "label" -> "int"))

  expected.foreach { case (name, cols) =>
    test(s"$name schema matches the shape every query was verified against") {
      val got = Tables.table(spark, sf, name).schema
      assert(got.fields.map(_.name).toSeq == cols.map(_._1),
        s"$name columns drifted: ${got.fields.map(_.name).toSeq} vs ${cols.map(_._1)}")
      cols.foreach { case (c, t) =>
        val dt = got(c).dataType
        val ok = t match {
          case "ts" => ts(dt)
          case other => dt.simpleString == other
        }
        assert(ok, s"$name.$c drifted to ${dt.simpleString} (expected $t)")
      }
    }
  }

  test("events loads through Tables.events with ts normalized to TimestampType") {
    val got = Tables.events(spark, sf).schema
    val want = Seq("event_id" -> "bigint", "ts" -> "timestamp", "user_id" -> "bigint",
      "event_type" -> "string", "value" -> "double", "props" -> "string")
    assert(got.fields.map(_.name).toSeq == want.map(_._1),
      s"events columns drifted: ${got.fields.map(_.name).toSeq}")
    want.foreach { case (c, t) =>
      assert(got(c).dataType.simpleString == t,
        s"events.$c drifted to ${got(c).dataType.simpleString} (expected $t)")
    }
  }
}
