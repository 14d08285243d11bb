package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.sources.Tables

/** DSIR-style data selection via hashed-n-gram importance resampling
  * (Xie et al., "Data Selection for Language Models via Importance
  * Resampling", NeurIPS 2023) — a north-star training-data-pipeline
  * extension (SURVEY.md §2.3; absent from the reference, whose only
  * dataflow is word count, /root/reference/src/mr/function.rs:9-16).
  *
  * The published recipe: featurize every document as a bag of hashed
  * unigrams+bigrams, fit bucket unigram models for a TARGET distribution
  * (the "want more of this" corpus — Wikipedia in the paper; the `en`
  * slice of `documents` here) and the RAW distribution (the whole
  * crawl), weight each document by its log-likelihood ratio
  * λ(d) = Σ_b c_b(d)·(ln p_target(b) − ln p_raw(b)), then sample the kept
  * subset with probability ∝ exp(λ) via Gumbel-top-k.
  *
  * Exactness adaptations (this repo's oracle discipline):
  *  - the gram→bucket hash is the first 6 hex chars of md5, parsed as an
  *    integer — byte-identical in Spark (`conv(substring(md5,1,6),16,10)`)
  *    and DuckDB (`CAST('0x'||substr(md5,1,6) AS BIGINT)`), both UTF-8;
  *  - per-bucket log-ratios are floored to integer NANO-NATS once (floor,
  *    not round: no half-rule divergence between engines), so the per-doc
  *    weight is a pure BIGINT dot product — order-independent under any
  *    partitioning, no float-sum nondeterminism;
  *  - the paper's Gumbel noise comes from a hash-derived uniform
  *    (md5 of a salted doc_id), so the "random" resample is reproducible
  *    and oracle-checkable.
  *
  * Scale shape (100 TB posture): gram extraction and bucketing are
  * row-local; the bucket models are a [[Buckets]]-key aggregate with
  * map-side partial combine (a ~KB result at any corpus size); the
  * log-ratio table joins back by BROADCAST; the per-doc weight is one
  * map-side-combinable groupBy(doc_id); the resample is a
  * TakeOrderedAndProject top-k, never a global window. The two integer
  * products inside the smoothed ratio are computed in DOUBLE (IEEE
  * multiply is deterministic in both engines) so gram totals beyond
  * 2^53 at production scale degrade in precision, never overflow.
  */
object Dsir {

  /** Hash-feature dimensionality. The paper uses 10k buckets for
    * CommonCrawl; 256 keeps every bucket populated at the test SFs while
    * exercising the identical dataflow (the bucket-model aggregate is
    * O(Buckets) regardless). */
  val Buckets = 256

  /** Docs kept by the resample (the paper keeps a target token budget;
    * a fixed doc count keeps the oracle's LIMIT exact). */
  val SampleK = 100

  private val HexDenom = "16777217.0" // 16^6 + 1: md5-derived uniform in (0,1)

  /** doc_id, lang, grams (unigrams ++ bigram shingles) — row-local. */
  private def gramsDf(spark: SparkSession, dir: String): DataFrame = {
    val tk = TextFunctions.tokens(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), tk.as("tk"))
      .select(col("doc_id"), col("lang"),
        concat(col("tk"), TextFunctions.wordShinglesFromTokens(col("tk"), 2))
          .as("grams"))
  }

  private def bucketOf(gram: Column): Column =
    conv(substring(md5(gram), 1, 6), 16, 10).cast("long") % Buckets

  /** Per-(doc, bucket) gram counts — the ONE tokenization pass, memoized
    * per (session, dataset identity) and persisted, same discipline as
    * TextAnalysis.scoredDocs: three consumers fold it (the bucket models,
    * their totals, and the per-doc weights), and exchange reuse cannot
    * deduplicate them structurally (the roster's left join pushes an
    * IsNotNull(doc_id) into one branch, breaking canonical equality; the
    * lambda-heavy tokenizer defeats AQE's canonicalized matching for the
    * rest — observed, not hypothesized: the unmemoized plan ran the gram
    * pass three times). The persisted aggregate is ≤ |docs|·min(Buckets,
    * doc_len) narrow rows — orders of magnitude smaller than the corpus —
    * and persist() spills to disk, so it is the cheap side of the
    * recompute-vs-materialize tradeoff at any scale. */
  private val countsMemo =
    new scala.collection.concurrent.TrieMap[(SparkSession, String), (String, DataFrame)]

  private def docBucketCounts(spark: SparkSession, dir: String): DataFrame = {
    countsMemo.keys.filter(_._1.sparkContext.isStopped).foreach(countsMemo.remove)
    val fp = graft.sources.DatasetId.fingerprint(dir)
    val k = (spark, dir)
    countsMemo.get(k) match {
      case Some((`fp`, df)) => df
      case stale =>
        stale.foreach { case (_, old) =>
          try { if (!spark.sparkContext.isStopped) old.unpersist() }
          catch { case scala.util.control.NonFatal(_) => () }
        }
        val df = gramsDf(spark, dir)
          .select(col("doc_id"), col("lang"), explode(col("grams")).as("g"))
          .select(col("doc_id"), col("lang"), bucketOf(col("g")).as("bucket"))
          .groupBy("doc_id", "lang", "bucket").agg(count(lit(1)).as("c"))
          .persist()
        countsMemo.put(k, (fp, df))
        df
    }
  }

  /** Per-bucket smoothed log-likelihood-ratio table: exactly [[Buckets]]
    * rows (bucket, target_grams, raw_grams, lr_nano). Add-1 smoothing on
    * both models; lr_nano = floor(1e9 · ln(p_target/p_raw)). Folds the
    * already-combined (doc, bucket) counts, so this second aggregate
    * shuffles at most |docs|·min(|buckets|, doc_len) rows into 256 keys. */
  private def lrTable(spark: SparkSession, dir: String): DataFrame = {
    val counts = docBucketCounts(spark, dir)
      .groupBy("bucket")
      .agg(sum("c").as("raw_g"),
        sum(when(col("lang") === "en", col("c")).otherwise(0L)).as("tgt_g"))
    val totals = counts.agg(
      sum("raw_g").as("rTot"), sum("tgt_g").as("tTot"))
    val domain = spark.range(Buckets).select(col("id").as("bucket"))
    domain.join(counts, Seq("bucket"), "left")
      .na.fill(0L, Seq("raw_g", "tgt_g"))
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        col("tgt_g").as("target_grams"), col("raw_g").as("raw_grams"),
        floor(log(
          ((col("tgt_g") + 1).cast("double") * (col("rTot") + Buckets).cast("double")) /
            ((col("raw_g") + 1).cast("double") * (col("tTot") + Buckets).cast("double"))
        ) * lit(1e9)).cast("long").as("lr_nano"))
  }

  /** doc roster with the integer importance weight; empty-token docs get
    * weight 0 (the empty product — DSIR is indifferent to them). The
    * roster (doc_id, lang) comes off the raw documents scan with the
    * text column PRUNED — n_grams is Σc from the shared aggregate, so no
    * consumer tokenizes the corpus a second time. */
  private def weighted(spark: SparkSession, dir: String): DataFrame = {
    val perDoc = docBucketCounts(spark, dir)
      .join(broadcast(lrTable(spark, dir).select("bucket", "lr_nano")), "bucket")
      .groupBy("doc_id")
      .agg(sum("c").cast("long").as("n_grams"),
        sum(col("c") * col("lr_nano")).as("weight_nano"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_grams", "weight_nano"))
  }

  /** Per-document DSIR importance weight in nano-nats. */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame =
    weighted(spark, dir)
      .select("doc_id", "lang", "n_grams", "weight_nano")
      .orderBy("doc_id")

  /** The fitted bucket models + log-ratio table (diagnostic the paper
    * plots; also the broadcast side of the scoring join). */
  def dsirBucketStats(spark: SparkSession, dir: String): DataFrame =
    lrTable(spark, dir).orderBy("bucket")

  /** Gumbel-top-k importance resample: key(d) = λ(d) + Gumbel(d), kept
    * set = top [[SampleK]] keys — samples without replacement with
    * P(keep) ∝ exp(λ), per the Gumbel-max trick, but from hash-derived
    * uniforms so the draw is deterministic. Selection is by the raw
    * double key (TakeOrderedAndProject); the EMITTED key is floored to
    * micro-units and the final display sort uses the emitted column so
    * engine and oracle order ties identically. */
  def dsirSample(spark: SparkSession, dir: String): DataFrame = {
    val h = conv(substring(md5(concat(lit("dsir:"), col("doc_id").cast("string"))), 1, 6),
      16, 10).cast("long")
    val u = (h + 1).cast("double") / expr(HexDenom)
    val key = col("weight_nano").cast("double") / lit(1e9) - log(-log(u))
    weighted(spark, dir)
      .withColumn("key", key)
      .orderBy(col("key").desc, col("doc_id"))
      .limit(SampleK)
      .select(col("doc_id"), col("lang"), col("weight_nano"),
        floor(col("key") * 1e6).cast("long").as("key_micro"))
      .orderBy(col("key_micro").desc, col("doc_id"))
  }

  /** The fitted bucket model as a PERSISTED parquet artifact (one `lr`
    * part, [[Buckets]] rows) under the same atomic-build protocol as the
    * BPE/IVF/gate-spec artifacts: training and serving communicate only
    * through the shipped file. The streaming twin reloads it as a dense
    * lr-by-bucket array and scores arriving micro-batches row-locally. */
  private val modelMemo =
    new scala.collection.concurrent.TrieMap[(SparkSession, String), String]

  private[graft] def modelRoot(spark: SparkSession, dir: String): String = {
    modelMemo.keys.filter(_._1.sparkContext.isStopped).foreach(modelMemo.remove)
    modelMemo.getOrElseUpdate((spark,
        graft.sources.ArtifactRoots.memoKey(spark, dir)), {
      val root = graft.sources.ArtifactRoots.rootFor(spark, "dsirmodel", dir)
      graft.sources.ArtifactRoots.atomicBuild(root, Seq("lr")) { stage =>
        lrTable(spark, dir).coalesce(1).write.mode("overwrite").parquet(s"$stage/lr")
      }
    })
  }

  /** Row-local DSIR scorer over ANY (doc_id, lang, text) frame under a
    * SHIPPED model (dense lr-by-bucket array): weight = fold over the
    * doc's own grams of lr[bucket(gram)] — an independent derivation of
    * Σ_b c_b·lr_b (the batch side's aggregate dot product), so the
    * streaming twin passing the SAME oracle is a real cross-derivation
    * check, not a replay. No join, no shuffle, no state: per-doc output
    * depends only on the doc and the artifact, which is what makes
    * micro-batched append value-identical to the corpus pass. */
  private[graft] def scoreFrame(docs: DataFrame, lrByBucket: Array[Long]): DataFrame = {
    require(lrByBucket.length == Buckets, s"model must have $Buckets buckets")
    val lrArr = array(lrByBucket.map(lit(_)): _*)
    val tk = TextFunctions.tokens(col("text"))
    docs
      .select(col("doc_id"), col("lang"), tk.as("tk"))
      .select(col("doc_id"), col("lang"),
        concat(col("tk"), TextFunctions.wordShinglesFromTokens(col("tk"), 2))
          .as("grams"))
      .select(col("doc_id"), col("lang"),
        size(col("grams")).cast("long").as("n_grams"),
        aggregate(col("grams"), lit(0L),
          (acc, g) => acc + element_at(lrArr, (bucketOf(g) + 1).cast("int")))
          .as("weight_nano"))
  }

  /** Drop and unpersist the memoized count stage so the pass genuinely
    * re-executes — ConfigInvarianceSpec discipline. */
  def clearMemo(): Unit = {
    countsMemo.values.foreach { case (_, df) =>
      try df.unpersist() catch { case scala.util.control.NonFatal(_) => () }
    }
    countsMemo.clear()
    modelMemo.clear()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dsir_weights" -> dsirWeights,
    "dsir_bucket_stats" -> dsirBucketStats,
    "dsir_sample" -> dsirSample,
  )

  // ---- oracle SQL (DuckDB) ----

  private val toksSql =
    "list_filter(string_split_regex(regexp_replace(text, '[^\\w\\s]+', '', 'g'), '\\s+'), t -> len(t) > 0)"

  /** Shared CTE chain ending in `dlr(bucket, target_grams, raw_grams,
    * lr_nano)` + `ddoc(doc_id, lang, grams)` — mirrors the engine's
    * dataflow with an independent SQL derivation (window-free, list
    * comprehensions instead of explode where DuckDB prefers them). */
  private val baseCtes =
    s"dtk AS (SELECT doc_id, lang, $toksSql AS tk FROM documents), " +
      "ddoc AS (SELECT doc_id, lang, list_concat(tk, " +
      "list_transform(generate_series(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1])) AS grams FROM dtk), " +
      "dexp AS (SELECT doc_id, lang, " +
      "CAST('0x' || substr(md5(unnest(grams)), 1, 6) AS BIGINT) % " + Buckets + " AS bucket FROM ddoc), " +
      "dbc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS raw_g, " +
      "CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS tgt_g FROM dexp GROUP BY bucket), " +
      "dtot AS (SELECT CAST(sum(raw_g) AS BIGINT) AS rTot, CAST(sum(tgt_g) AS BIGINT) AS tTot FROM dbc), " +
      s"ddom AS (SELECT unnest(generate_series(0, ${Buckets - 1})) AS bucket), " +
      "dlr AS (SELECT CAST(ddom.bucket AS BIGINT) AS bucket, " +
      "CAST(coalesce(tgt_g, 0) AS BIGINT) AS target_grams, " +
      "CAST(coalesce(raw_g, 0) AS BIGINT) AS raw_grams, " +
      s"CAST(floor(ln((CAST(coalesce(tgt_g, 0) + 1 AS DOUBLE) * CAST(rTot + $Buckets AS DOUBLE)) / " +
      s"(CAST(coalesce(raw_g, 0) + 1 AS DOUBLE) * CAST(tTot + $Buckets AS DOUBLE))) * 1e9) AS BIGINT) AS lr_nano " +
      "FROM ddom LEFT JOIN dbc ON ddom.bucket = dbc.bucket CROSS JOIN dtot)"

  private val weightCtes =
    baseCtes + ", " +
      "ddc AS (SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS c FROM dexp GROUP BY doc_id, bucket), " +
      "dw AS (SELECT doc_id, CAST(sum(c * lr_nano) AS BIGINT) AS weight_nano " +
      "FROM ddc JOIN dlr USING (bucket) GROUP BY doc_id), " +
      "dwfull AS (SELECT ddoc.doc_id, lang, CAST(len(grams) AS BIGINT) AS n_grams, " +
      "CAST(coalesce(weight_nano, 0) AS BIGINT) AS weight_nano " +
      "FROM ddoc LEFT JOIN dw ON ddoc.doc_id = dw.doc_id)"

  def oracle: Map[String, String] = Map(
    "dsir_weights" ->
      s"WITH $weightCtes SELECT doc_id, lang, n_grams, weight_nano FROM dwfull ORDER BY doc_id",
    "dsir_bucket_stats" ->
      s"WITH $baseCtes SELECT bucket, target_grams, raw_grams, lr_nano FROM dlr ORDER BY bucket",
    "dsir_sample" ->
      (s"WITH $weightCtes, " +
        "dkeyed AS (SELECT doc_id, lang, weight_nano, " +
        "CAST(weight_nano AS DOUBLE) / 1e9 - ln(-ln(" +
        "(CAST(CAST('0x' || substr(md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) + 1 AS DOUBLE)" +
        s" / $HexDenom))) AS skey FROM dwfull), " +
        s"dtop AS (SELECT * FROM dkeyed ORDER BY skey DESC, doc_id LIMIT $SampleK) " +
        "SELECT doc_id, lang, weight_nano, CAST(floor(skey * 1e6) AS BIGINT) AS key_micro " +
        "FROM dtop ORDER BY key_micro DESC, doc_id"),
  )
}
