package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.sources.Tables

/** Deduplication operators for LLM-training-data pipelines (north star in
  * /root/repo/BASELINE.json; no equivalent in the reference, whose only
  * "dedup" is the distinct-key effect of groupBy — SURVEY.md §2.3).
  *
  * Scale design, per operator:
  *  - exact: group by a 128-bit content fingerprint, not the full text —
  *    the shuffle carries 16-byte digests instead of documents.
  *  - MinHash+LSH: signatures are computed row-locally (no per-token
  *    explode); only (doc, band, bandhash) rows — b rows per doc — are
  *    shuffled, and the candidate join is an equi-join on (band, bandhash)
  *    buckets. This is the classic sub-quadratic near-dup path: O(n·b)
  *    shuffle instead of O(n²) compare.
  *  - SimHash: one 32-bit signature per doc from md5 hex digits, again
  *    row-local; identical-signature grouping is a fingerprint dedup.
  *  - n-gram Jaccard: exact pairwise verification *within blocking groups*
  *    (lang, source) — the pattern used to re-rank LSH candidates; the
  *    cross product never leaves a bucket.
  *
  * All hashes are md5 (identical hex output on Spark and DuckDB; for
  * fixed-length lowercase hex, lexicographic MIN == numeric MIN), which is
  * what makes every one of these SQL-expressible for the oracle.
  */
object Dedup {

  private val K = 8 // minhash signature length
  private val B = 4 // LSH bands (rows per band = K/B = 2)

  private def toksCol: Column = TextFunctions.tokens(col("text"))

  /** Exact dedup by content fingerprint: one row per distinct text, keeping
    * the smallest doc_id as the canonical representative. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy("keep_id")

  /** MinHash + LSH candidate pairs. k=8 hashes, 4 bands × 2 rows. */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"),
        array_distinct(TextFunctions.wordShingles(col("text"), 3)).as("shingles"))
      .filter(size(col("shingles")) > 0)
    val sig = sh.select(col("doc_id"),
      TextFunctions.minhashSignature(col("shingles"), K).as("sig"))
    val bands = sig.select(col("doc_id"), explode(array((0 until B).map { j =>
      struct(lit(j).as("band"),
        md5(concat(col("sig")(2 * j), col("sig")(2 * j + 1))).as("bh"))
    }: _*)).as("e"))
      .select(col("doc_id"), col("e.band"), col("e.bh"))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
      .orderBy("id1", "id2")
  }

  /** Hex digit value of the 1-based j-th char of an md5 prefix. */
  private def hexVal(h: Column, j: Int): Column = {
    val a = ascii(substring(h, j, 1))
    a - lit(48) - when(a >= 97, lit(39)).otherwise(lit(0))
  }

  /** 32-bit SimHash per document from token md5s (majority vote per bit). */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val hashes = transform(toksCol, t => substring(md5(t), 1, 8))
    val withH = Tables.documents(spark, dir)
      .select(col("doc_id"), hashes.as("hashes"), size(hashes).as("n"))
    val simhash = (0 until 32).map { b =>
      val j = b / 4 + 1
      val s = b % 4
      val cnt = size(filter(col("hashes"),
        h => shiftright(hexVal(h, j), s).bitwiseAND(lit(1)) === 1))
      when(cnt * 2 > col("n"), lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    withH.select(col("doc_id"), simhash.cast("long").as("simhash"))
      .orderBy("doc_id")
  }

  /** Exact Jaccard over distinct char-5-grams for pairs inside a
    * (lang, source) blocking group — the verification stage an LSH
    * pipeline runs on its candidates. */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        array_distinct(TextFunctions.charNGrams(col("text"), 5)).as("g"))
      .filter(size(col("g")) > 0)
    val inter = size(array_intersect(col("a.g"), col("b.g")))
    val jac = inter / (size(col("a.g")) + size(col("b.g")) - inter)
    g.as("a")
      .join(g.as("b"),
        col("a.lang") === col("b.lang") && col("a.source") === col("b.source") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        round(jac, 6).as("jaccard"))
      .filter(col("jaccard") >= 0.2)
      .orderBy("id1", "id2")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> dedupExact,
    "dedup_minhash_lsh" -> dedupMinhashLsh,
    "dedup_simhash" -> dedupSimhash,
    "dedup_ngram_jaccard" -> dedupNgramJaccard,
  )

  // ---- oracle SQL ----

  private val toksSql =
    "list_filter(string_split_regex(regexp_replace(text, '[^\\w\\s]+', '', 'g'), '\\s+'), t -> len(t) > 0)"

  private def sigSql: String =
    (0 until K).map(i =>
      s"list_min(list_transform(shingles, s -> md5('$i:' || s)))").mkString("[", ", ", "]")

  private def simhashTermsSql: String =
    (0 until 32).map { b =>
      val j = b / 4 + 1
      val s = b % 4
      val hv = s"(ascii(substr(h, $j, 1)) - 48 - CASE WHEN ascii(substr(h, $j, 1)) >= 97 THEN 39 ELSE 0 END)"
      s"CASE WHEN 2 * len(list_filter(hashes, h -> (($hv >> $s) & 1) = 1)) > n THEN CAST(${1L << b} AS BIGINT) ELSE 0 END"
    }.mkString(" + ")

  val oracle: Map[String, String] = Map(
    "dedup_exact" ->
      ("SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_dups " +
        "FROM documents GROUP BY md5(text) ORDER BY keep_id"),
    "dedup_minhash_lsh" ->
      (s"WITH toks AS (SELECT doc_id, $toksSql AS toks FROM documents), " +
        "sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks) - 2), " +
        "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS shingles FROM toks WHERE len(toks) >= 3), " +
        s"sig AS (SELECT doc_id, $sigSql AS sig FROM sh), " +
        "bands AS (SELECT doc_id, t.i AS band, md5(sig[2*t.i+1] || sig[2*t.i+2]) AS bh " +
        "FROM sig CROSS JOIN (VALUES (0), (1), (2), (3)) t(i)) " +
        "SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2 FROM bands a " +
        "JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id " +
        "ORDER BY id1, id2"),
    "dedup_simhash" ->
      (s"SELECT doc_id, CAST($simhashTermsSql AS BIGINT) AS simhash FROM " +
        s"(SELECT doc_id, list_transform($toksSql, t -> substr(md5(t), 1, 8)) AS hashes, " +
        s"len($toksSql) AS n FROM documents) ORDER BY doc_id"),
    "dedup_ngram_jaccard" ->
      ("WITH g AS (SELECT doc_id, lang, source, " +
        "list_distinct(list_transform(generate_series(1, len(text) - 4), i -> substr(text, i, 5))) AS g " +
        "FROM documents WHERE len(text) >= 5) " +
        "SELECT id1, id2, jaccard FROM (SELECT a.doc_id AS id1, b.doc_id AS id2, " +
        "round(len(list_intersect(a.g, b.g)) / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))), 6) AS jaccard " +
        "FROM g a JOIN g b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id) " +
        "WHERE jaccard >= 0.2 ORDER BY id1, id2"),
  )
}
