package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Data-layout keys: Z-order (Morton) interleaving for multi-dimensional
  * clustering. The reference writes plain sorted text partitions
  * (/root/reference/src/mr/worker.rs:195-197) — one sort dimension; a
  * 100 TB table queried by BOTH price band and date range wants its files
  * clustered so either predicate prunes row groups, which is what sorting
  * by an interleaved-bit key gives (the standard lakehouse OPTIMIZE
  * ZORDER BY layout pass).
  *
  * Scale shape: one tiny min/max aggregate (broadcast back), then the
  * bucketing + bit-interleave is row-local integer math inside
  * whole-stage codegen — the actual layout pass is
  * `repartitionByRange(zkey).sortWithinPartitions(zkey).write`, and the
  * key computation here is the whole algorithmic content of it.
  * Determinism: bucket edges come from min/max (not ntile ranks), so the
  * key is a pure function of the row value and two broadcast scalars —
  * identical in any engine, no distributed-rank nondeterminism. */
object Layout {

  private val Bits = 8 // 8 bits per dimension -> 16-bit z-key

  /** Bucket a double into [0, 2^Bits) given inclusive min/max. The +1e-9
    * span pad keeps max itself inside the top bucket; all arithmetic is
    * IEEE double in a fixed order so engines agree bit-for-bit. */
  private def bucket(x: Column, lo: Column, hi: Column): Column =
    floor((x - lo) * (1 << Bits) / (hi - lo + lit(1e-9))).cast("int")

  /** Interleave the low `Bits` bits of two ints: x gets the even bit
    * positions, y the odd. */
  private def interleave(bx: Column, by: Column): Column =
    (0 until Bits).map { i =>
      shiftleft(shiftright(bx, i).bitwiseAND(lit(1)), 2 * i) +
        shiftleft(shiftright(by, i).bitwiseAND(lit(1)), 2 * i + 1)
    }.reduce(_ + _)

  /** Per-order bucket pair (bp, bd) + interleaved zkey — the shared stage
    * of the layout pass and its manifest audit. */
  private def zkeyed(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice").as("price"),
        // orderdate is TIMESTAMP_NTZ; the cast reads it at the session TZ
        // (pinned UTC everywhere), matching DuckDB epoch_us on the naive ts
        floor(unix_micros(col("o_orderdate").cast("timestamp")) / lit(86400000000L))
          .cast("double").as("day"))
    val mm = o.agg(min("price").as("minp"), max("price").as("maxp"),
      min("day").as("mind"), max("day").as("maxd"))
    o.crossJoin(broadcast(mm))
      .select(col("o_orderkey"),
        bucket(col("price"), col("minp"), col("maxp")).as("bp"),
        bucket(col("day"), col("mind"), col("maxd")).as("bd"))
      .withColumn("zkey", interleave(col("bp"), col("bd")))
  }

  /** Z-order key for every order over (o_totalprice, o_orderdate):
    * (o_orderkey, zkey). Sorting/range-partitioning by zkey is the layout
    * pass; this query exposes (and oracle-checks) the key math. */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame =
    zkeyed(spark, dir).select(col("o_orderkey"), col("zkey")).orderBy("o_orderkey")

  /** Zone-map manifest of the z-ordered layout — the DATA-SKIPPING audit.
    * After the layout pass range-partitions by zkey, a file/shard is a
    * contiguous zkey range, so shard id = the key's top 6 bits (64
    * shards) — a pure function of the row, no distributed-rank
    * nondeterminism. The manifest records per shard what a reader's
    * min/max pruning sees: row count plus min/max of BOTH source
    * dimensions' buckets. Z-order's whole point is visible in the
    * result — every shard spans a NARROW range of bp AND bd, so a
    * predicate on either price or date prunes most shards; a single-dim
    * sort would leave the other dimension's span full-width. Scale
    * shape: one scan, row-local key math, partial+final aggregate over
    * ≤64 groups — the manifest is O(shards), never O(rows). */
  def zoneMapManifest(spark: SparkSession, dir: String): DataFrame =
    zkeyed(spark, dir)
      .select(shiftright(col("zkey"), 2 * Bits - 6).as("shard"),
        col("bp"), col("bd"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        min("bp").as("min_bp"), max("bp").as("max_bp"),
        min("bd").as("min_bd"), max("bd").as("max_bd"))
      .orderBy("shard")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "zorder_layout" -> zorderLayout,
    "zone_map_manifest" -> zoneMapManifest,
  )

  val oracle: Map[String, String] = {
    def bucketSql(x: String, lo: String, hi: String): String =
      s"CAST(floor(($x - $lo) * ${1 << Bits} / ($hi - $lo + 1e-9)) AS INT)"
    val inter = (0 until Bits).map { i =>
      s"((((bp >> $i) & 1) << ${2 * i}) + (((bd >> $i) & 1) << ${2 * i + 1}))"
    }.mkString(" + ")
    val baseCtes =
      "WITH o AS (SELECT o_orderkey, o_totalprice AS price, " +
        "CAST(floor(epoch_us(o_orderdate) / 86400000000) AS DOUBLE) AS day FROM orders), " +
        "mm AS (SELECT min(price) AS minp, max(price) AS maxp, " +
        "min(day) AS mind, max(day) AS maxd FROM o), " +
        "b AS (SELECT o_orderkey, " +
        bucketSql("price", "minp", "maxp") + " AS bp, " +
        bucketSql("day", "mind", "maxd") + " AS bd FROM o CROSS JOIN mm)"
    Map(
      "zorder_layout" ->
        (baseCtes +
          s" SELECT o_orderkey, CAST($inter AS INT) AS zkey FROM b ORDER BY o_orderkey"),
      "zone_map_manifest" ->
        (baseCtes +
          s", z AS (SELECT bp, bd, CAST($inter AS INT) AS zkey FROM b) " +
          s"SELECT CAST(zkey >> ${2 * Bits - 6} AS INT) AS shard, " +
          "CAST(count(*) AS BIGINT) AS n_rows, " +
          "min(bp) AS min_bp, max(bp) AS max_bp, " +
          "min(bd) AS min_bd, max(bd) AS max_bd " +
          "FROM z GROUP BY 1 ORDER BY shard"),
    )
  }
}
