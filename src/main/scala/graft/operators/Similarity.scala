package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.plans.VectorExpressions.{lsh_bucket, vec_cosine}
import graft.sources.Tables

/** Similarity search over the embeddings table (north-star extension; the
  * reference has no numeric capability at all — its one value type is the
  * string "1", /root/reference/src/mr/function.rs:14).
  *
  * Two paths, as a real ANN pipeline would ship them:
  *  - brute-force cosine top-k: the exact baseline. O(Q·N·d); the query
  *    side is broadcast so the big side never shuffles — at 100 TB the
  *    corpus streams through map tasks once.
  *  - LSH-bucketed: random-hyperplane signatures (8 planes → 256 buckets)
  *    computed row-locally; candidate generation is an equi-join on the
  *    bucket id. Sub-quadratic; the scale path when Q is also huge.
  */
object Similarity {

  private val Dim = 64
  private val Planes = 8

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))

  /** Exact top-5 cosine neighbors for each query vector (vec_id < 10). */
  def cosineTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("vec_id"))
    e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(vec_cosine(col("qv"), col("v")), 6).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("qid", "vec_id", "cos", "rn")
      .orderBy("qid", "rn")
  }

  /** LSH bucket assignment (the signature stage of the ANN index). */
  def annLshBuckets(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir)
      .select(col("vec_id"), lsh_bucket(col("v"), Planes, Dim).as("bucket"))
      .orderBy("vec_id")

  /** Candidate pairs that share an LSH bucket, scored with exact cosine —
    * generate-then-verify, the standard ANN shape. */
  def annLshPairs(spark: SparkSession, dir: String): DataFrame = {
    val b = emb(spark, dir)
      .select(col("vec_id"), col("v"), lsh_bucket(col("v"), Planes, Dim).as("bucket"))
    b.as("a")
      .join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        round(vec_cosine(col("a.v"), col("b.v")), 6).as("cos"))
      .orderBy("id1", "id2")
  }

  private val IvfK = 16     // coarse centroids
  private val IvfProbes = 2 // cells searched per query

  /** IVF cell assignment (the build stage of an inverted-file ANN index):
    * centroids are the first K vectors (deterministic coarse quantizer —
    * a k-means refinement would slot in here), broadcast; every vector
    * joins only the K-row centroid table and keeps its nearest cell.
    * Map-only over the corpus — the 100 TB-friendly build. */
  def ivfAssign(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val cents = e.filter(col("vec_id") < IvfK)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val w = Window.partitionBy("vec_id").orderBy(desc("sim"), asc("cid"))
    e.join(broadcast(cents), col("vec_id") =!= lit(-1))
      .select(col("vec_id"), col("cid"),
        round(vec_cosine(col("v"), col("cv")), 6).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid").as("cell"))
      .orderBy("vec_id")
  }

  /** IVF probe search: each query ranks the K centroids, searches only its
    * top-`IvfProbes` cells, and ranks candidates by exact cosine — the
    * classic recall/cost dial. Only the probed cells' vectors are scored. */
  def ivfSearch(spark: SparkSession, dir: String): DataFrame = {
    val assign = ivfAssign(spark, dir)
      .select(col("vec_id").as("cand_id"), col("cell"))
    val e = emb(spark, dir)
    val cents = e.filter(col("vec_id") < IvfK)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val wProbe = Window.partitionBy("qid").orderBy(desc("csim"), asc("cid"))
    val probes = q.join(broadcast(cents), lit(true))
      .select(col("qid"), col("qv"), col("cid"),
        round(vec_cosine(col("qv"), col("cv")), 6).as("csim"))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= IvfProbes)
      .select(col("qid"), col("qv"), col("cid").as("cell"))
    val wRank = Window.partitionBy("qid").orderBy(desc("cos"), asc("cand_id"))
    probes.join(assign, "cell")
      .filter(col("cand_id") =!= col("qid"))
      .join(e.select(col("vec_id").as("cand_id"), col("v").as("cv2")), "cand_id")
      .select(col("qid"), col("cand_id"),
        round(vec_cosine(col("qv"), col("cv2")), 6).as("cos"))
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= 3)
      .select("qid", "cand_id", "cos", "rn")
      .orderBy("qid", "rn")
  }

  /** Embedding-cosine near-duplicate pairs: the dedup-flavored use of the
    * ANN path — LSH candidates filtered to cosine ≥ 0.5. Same
    * generate-then-verify shape; the threshold makes it a dedup decision
    * rather than a ranking. */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame =
    annLshPairs(spark, dir).filter(col("cos") >= 0.5)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cosine_topk" -> cosineTopk,
    "ann_lsh_buckets" -> annLshBuckets,
    "ann_lsh_pairs" -> annLshPairs,
    "dedup_embedding" -> dedupEmbedding,
    "ivf_assign" -> ivfAssign,
    "ivf_search" -> ivfSearch,
  )

  // ---- oracle SQL ----

  /** Strict-left-fold dot product between two double lists in DuckDB —
    * operation order identical to VectorFunctions.dot. */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, $Dim), i -> $a[i] * $b[i]), (x, y) -> x + y)"

  private def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / sqrt(${dotSql(a, a)} * ${dotSql(b, b)}))"

  private val toDoubleSql = "list_transform(embedding, x -> CAST(x AS DOUBLE))"

  /** Literal ±1 projection sum for hyperplane h (shared sign matrix). */
  private def projSql(h: Int): String =
    (0 until Dim).map { i =>
      val s = if (planeSign(h, i) > 0) "+" else "-"
      s"$s v[${i + 1}]"
    }.mkString("(", " ", ")")

  private def bucketSql: String =
    (0 until Planes).map(h =>
      s"CASE WHEN ${projSql(h)} >= 0 THEN ${1 << h} ELSE 0 END").mkString(" + ")

  val oracle: Map[String, String] = Map(
    "cosine_topk" ->
      (s"WITH e AS (SELECT vec_id, $toDoubleSql AS v FROM embeddings), " +
        "q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10), " +
        s"scored AS (SELECT qid, vec_id, round(${cosSql("qv", "v")}, 6) AS cos " +
        "FROM e CROSS JOIN q WHERE vec_id <> qid), " +
        "ranked AS (SELECT qid, vec_id, cos, row_number() OVER " +
        "(PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn FROM scored) " +
        "SELECT qid, vec_id, cos, rn FROM ranked WHERE rn <= 5 ORDER BY qid, rn"),
    "ann_lsh_buckets" ->
      (s"SELECT vec_id, CAST($bucketSql AS INT) AS bucket " +
        s"FROM (SELECT vec_id, $toDoubleSql AS v FROM embeddings) ORDER BY vec_id"),
    "ann_lsh_pairs" ->
      (s"WITH b AS (SELECT vec_id, v, CAST($bucketSql AS INT) AS bucket " +
        s"FROM (SELECT vec_id, $toDoubleSql AS v FROM embeddings)) " +
        "SELECT x.vec_id AS id1, y.vec_id AS id2, " +
        s"round(${cosSql("x.v", "y.v")}, 6) AS cos " +
        "FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id " +
        "ORDER BY id1, id2"),
    "dedup_embedding" ->
      (s"WITH b AS (SELECT vec_id, v, CAST($bucketSql AS INT) AS bucket " +
        s"FROM (SELECT vec_id, $toDoubleSql AS v FROM embeddings)) " +
        "SELECT id1, id2, cos FROM (SELECT x.vec_id AS id1, y.vec_id AS id2, " +
        s"round(${cosSql("x.v", "y.v")}, 6) AS cos " +
        "FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id) " +
        "WHERE cos >= 0.5 ORDER BY id1, id2"),
    "ivf_assign" ->
      (s"WITH e AS (SELECT vec_id, $toDoubleSql AS v FROM embeddings), " +
        s"c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < $IvfK), " +
        s"scored AS (SELECT e.vec_id, c.cid, round(${cosSql("e.v", "c.cv")}, 6) AS sim FROM e CROSS JOIN c), " +
        "ranked AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn FROM scored) " +
        "SELECT vec_id, cid AS cell FROM ranked WHERE rn = 1 ORDER BY vec_id"),
    "ivf_search" ->
      (s"WITH e AS (SELECT vec_id, $toDoubleSql AS v FROM embeddings), " +
        s"c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < $IvfK), " +
        s"ascored AS (SELECT e.vec_id, c.cid, round(${cosSql("e.v", "c.cv")}, 6) AS sim FROM e CROSS JOIN c), " +
        "assign AS (SELECT vec_id AS cand_id, cid AS cell FROM " +
        "(SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn FROM ascored) WHERE rn = 1), " +
        "q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10), " +
        s"pscored AS (SELECT q.qid, q.qv, c.cid, round(${cosSql("q.qv", "c.cv")}, 6) AS csim FROM q CROSS JOIN c), " +
        "probes AS (SELECT qid, qv, cid AS cell FROM " +
        s"(SELECT qid, qv, cid, row_number() OVER (PARTITION BY qid ORDER BY csim DESC, cid) AS pr FROM pscored) WHERE pr <= $IvfProbes), " +
        "cand AS (SELECT p.qid, p.qv, a.cand_id FROM probes p JOIN assign a ON p.cell = a.cell WHERE a.cand_id <> p.qid), " +
        s"cscored AS (SELECT qid, cand_id, round(${cosSql("qv", "e2.v")}, 6) AS cos FROM cand JOIN e e2 ON e2.vec_id = cand_id), " +
        "ranked AS (SELECT qid, cand_id, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cand_id) AS rn FROM cscored) " +
        "SELECT qid, cand_id, cos, rn FROM ranked WHERE rn <= 3 ORDER BY qid, rn"),
  )
}
