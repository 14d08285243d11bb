package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata (north-star extension; the
  * reference is strings-only, /root/reference/src/mr/worker.rs:9-13).
  *
  * The decode/resize steps are REAL for PNG and BMP payloads (JDK
  * `javax.imageio` — no external dependency): magic-byte sniff routes
  * image payloads through the codec and everything else through the
  * clearly-marked deterministic stubs (`decodeStub`/`resizeStub`), so the
  * synthetic text corpus stays oracle-expressible while genuine image
  * bytes get genuine dimensions. Audio/video codecs aren't in the JDK;
  * those payloads keep the stub path, and swapping it for a JNI call is
  * a one-function change.
  *
  * Scale notes: payload bytes never shuffle — metadata extraction is
  * map-only; frame sampling emits fixed-size slices (bounded fan-out) and
  * the per-partition iterator shape is exactly what a batched native
  * decoder (arrow batches into a codec) needs.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, media: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Long, digest: String,
      width: Int, height: Int, channels: Int)

  /** STUB decoder: the deterministic fallback for payloads no in-JVM
    * codec can read (dimensions derived from the first two payload
    * bytes, mirroring how a header parse would behave). Real PNG/BMP
    * payloads take the `javax.imageio` path in `decode`. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val b0 = if (bytes.length > 0) bytes(0) & 0xff else 0
    val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
    (64 + b0 % 64, 64 + b1 % 64, 3)
  }

  private val PngMagic: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Magic-byte sniff: PNG's 8-byte signature or BMP's "BM". Cheap and
    * row-local; a false positive (ASCII text starting "BM") is harmless —
    * the codec parse fails and the stub fallback keeps the output
    * deterministic. */
  def looksLikeImage(bytes: Array[Byte]): Boolean =
    (bytes.length >= PngMagic.length &&
      java.util.Arrays.equals(bytes, 0, PngMagic.length, PngMagic, 0, PngMagic.length)) ||
      (bytes.length >= 2 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)

  /** REAL decode for PNG/BMP via the JDK's `javax.imageio` (no external
    * dependency, headless-safe), stub fallback for everything else —
    * so the media layer is non-synthetic wherever the JVM has a codec.
    * Channels = the color model's component count (RGB 3, RGBA 4,
    * grayscale 1). Any parse failure falls back to the stub rather than
    * failing the partition: at 100 TB a corrupt payload is data, not an
    * exception. */
  def decode(bytes: Array[Byte]): (Int, Int, Int) =
    if (!looksLikeImage(bytes)) decodeStub(bytes)
    else
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) decodeStub(bytes)
        else (img.getWidth, img.getHeight, img.getColorModel.getNumComponents)
      } catch { case scala.util.control.NonFatal(_) => decodeStub(bytes) }

  private def hexMd5(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"$b%02x").mkString

  /** The typed per-partition decode pipeline: Dataset[MediaRecord] →
    * Dataset[MediaMeta], one iterator pass per partition (the JVM-side
    * equivalent of a Pandas-UDF mapInPandas batch loop). */
  def decodeMeta(ds: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val (w, h, c) = decode(r.media)
      MediaMeta(r.doc_id, r.media.length.toLong, hexMd5(r.media), w, h, c)
    })
  }

  /** Documents' text bytes standing in for media payloads (no binary
    * testdata exists; UTF-8 ASCII text keeps the oracle expressible). */
  private def asMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[MediaRecord]
  }

  /** Metadata extraction over binary payloads via the typed pipeline. */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    decodeMeta(asMedia(spark, dir)).toDF().orderBy("doc_id")

  /** Frame sampling: one 16-byte slice every 64 bytes of payload —
    * bounded fan-out explode, fingerprint per frame. Pure codegen'd
    * expressions (the fast path when the sampler doesn't need a codec). */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val bin = encode(col("text"), "UTF-8")
    Tables.documents(spark, dir)
      .select(col("doc_id"), bin.as("media"), octet_length(bin).as("n_bytes"))
      .filter(col("n_bytes") >= 16)
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(0), floor((col("n_bytes") - 16) / 64).cast("int")),
          i => struct(i.as("frame_idx"),
            md5(col("media").substr(i * 64 + 1, lit(16))).as("frame_md5")))).as("f"))
      .select(col("doc_id"), col("f.frame_idx"), col("f.frame_md5"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Feature extraction over binary payloads: bytes → fixed-dim vector,
    * the embedding-extractor shape (same signature and per-partition batch
    * loop a real neural encoder needs; swap the histogram for a model
    * call and nothing else changes). STUB featurizer = 16-bin high-nibble
    * byte histogram, emitted as raw counts so the normalize+round happens
    * in Spark SQL expressions — the codepath whose rounding provably
    * matches the DuckDB oracle. Map-only; payload bytes never shuffle. */
  private def featureCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[MediaRecord]
      .mapPartitions(_.map { r =>
        val counts = new Array[Long](16)
        r.media.foreach(b => counts((b & 0xff) >> 4) += 1)
        (r.doc_id, r.media.length.toLong, counts)
      })
      .toDF("doc_id", "n_bytes", "counts")
      .filter(col("n_bytes") > 0)
  }

  /** Library surface: the normalized feature vector, ready for the
    * Similarity operators' Array-typed embedding column convention. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    featureCounts(spark, dir)
      .select(col("doc_id"), col("n_bytes"),
        transform(col("counts"),
          c => round(c.cast("double") / col("n_bytes"), 6)).as("features"))
      .orderBy("doc_id")

  /** Oracle-gated shape of the same pipeline: the raw integer histogram as
    * a CSV string — array-typed and float-formatted outputs don't survive
    * the cross-engine hash compare, integer text does, and the float
    * vector is a deterministic pure function of these counts. */
  def mediaFeaturesQuery(spark: SparkSession, dir: String): DataFrame =
    featureCounts(spark, dir)
      .select(col("doc_id"), col("n_bytes"),
        array_join(transform(col("counts"), _.cast("string")), ",").as("hist"))
      .orderBy("doc_id")

  /** STUB resize: the deterministic fallback for non-image payloads —
    * keeps every 4th payload byte (stride downsample). Real PNG/BMP
    * payloads take the codec path in `resize`. */
  def resizeStub(bytes: Array[Byte]): Array[Byte] =
    bytes.indices.by(4).map(bytes(_)).toArray

  /** REAL resize for PNG/BMP: decode via `javax.imageio`, halve each
    * dimension (floor, min 1) with a bilinear Graphics2D draw, re-encode
    * as PNG. Stub fallback for everything else, same failure policy as
    * `decode`. */
  def resize(bytes: Array[Byte]): Array[Byte] =
    if (!looksLikeImage(bytes)) resizeStub(bytes)
    else
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) resizeStub(bytes)
        else {
          val w = math.max(1, img.getWidth / 2)
          val h = math.max(1, img.getHeight / 2)
          val out = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          bos.toByteArray
        }
      } catch { case scala.util.control.NonFatal(_) => resizeStub(bytes) }

  /** Resize pipeline over binary payloads via typed mapPartitions. */
  def mediaResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[MediaRecord]
      .mapPartitions(_.map { r =>
        val resized = resize(r.media)
        (r.doc_id, r.media.length.toLong, resized.length.toLong, hexMd5(resized))
      })
      .toDF("doc_id", "orig_bytes", "resized_bytes", "resized_digest")
      .orderBy("doc_id")
  }

  /** Content-addressed media dedup: identical payloads collapse on their
    * digest — only 16-byte digests ride the shuffle (payload bytes stay
    * where they were scanned), the media twin of Dedup.dedupExact. At
    * 100 TB this is THE first pass of any image/video corpus: byte-exact
    * copies dominate crawl duplicates and cost nothing to find. */
  def mediaDedup(spark: SparkSession, dir: String): DataFrame =
    decodeMeta(asMedia(spark, dir)).toDF()
      .groupBy("digest")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"),
        max(col("n_bytes")).as("n_bytes"))
      .orderBy("keep_id")

  /** Content-addressed storage manifest: payloads bucketed into 16 shards
    * by digest prefix — the CAS layout pass (shard = directory, objects
    * addressed by hash) that makes media storage rebalanceable and
    * dedup-friendly. Map-only to the 16-row manifest. */
  def mediaShardManifest(spark: SparkSession, dir: String): DataFrame =
    decodeMeta(asMedia(spark, dir)).toDF()
      .groupBy(substring(col("digest"), 1, 1).as("shard"))
      .agg(count(lit(1)).as("n_objects"),
        sum(col("n_bytes")).as("total_bytes"),
        countDistinct(col("digest")).as("n_distinct"))
      .orderBy("shard")

  /** Cross-document frame dedup: sampled frames shared by more than one
    * payload, with the canonical (smallest) owner — the frame-level
    * near-dup pass a video pipeline runs after per-file dedup (shared
    * intros/outros/stock footage survive file-level digests). Shuffles
    * only (frame_md5, doc_id) pairs. */
  def frameDedup(spark: SparkSession, dir: String): DataFrame =
    frameSample(spark, dir)
      .groupBy("frame_md5")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("canonical_doc"))
      .filter(col("n_docs") > 1)
      .orderBy("frame_md5")

  /** CAS retention GC: after a delete pass retires documents (the
    * `% 10` delta convention shared with dedup_incremental), find the
    * stored objects NO live document references any more — per shard,
    * how many orphans and how many bytes a sweep reclaims. This is the
    * mark phase of content-addressed garbage collection, and it is one
    * grouped aggregate over (digest, liveness): payload bytes never
    * move, reference liveness folds map-side, and the orphan set —
    * not the store — bounds the output. A digest survives iff ANY
    * referrer is live, so correctness is per-group `sum(live)=0`, not
    * a row filter. */
  def casOrphans(spark: SparkSession, dir: String): DataFrame =
    decodeMeta(asMedia(spark, dir)).toDF()
      .groupBy("digest")
      .agg(max(col("n_bytes")).as("n_bytes"),
        sum(when(col("doc_id") % 10 =!= 0, 1L).otherwise(0L))
          .as("live_refs"))
      .filter(col("live_refs") === 0)
      .groupBy(substring(col("digest"), 1, 1).as("shard"))
      .agg(count(lit(1)).as("n_orphans"),
        sum(col("n_bytes")).as("reclaimed_bytes"))
      .orderBy("shard")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cas_orphans" -> casOrphans,
    "frame_dedup" -> frameDedup,
    "multimodal_meta" -> multimodalMeta,
    "frame_sample" -> frameSample,
    "media_resize" -> mediaResize,
    "media_features" -> mediaFeaturesQuery,
    "media_dedup" -> mediaDedup,
    "media_shard_manifest" -> mediaShardManifest,
  )

  // Oracle: text is ASCII, so byte arithmetic == char arithmetic and
  // md5(blob) == md5(text) — the stub's behavior is fully SQL-expressible.
  val oracle: Map[String, String] = Map(
    "cas_orphans" ->
      ("SELECT substr(digest, 1, 1) AS shard, count(*) AS n_orphans, " +
        "CAST(sum(n_bytes) AS BIGINT) AS reclaimed_bytes FROM " +
        "(SELECT md5(text) AS digest, CAST(max(len(text)) AS BIGINT) AS n_bytes, " +
        "sum(CASE WHEN doc_id % 10 <> 0 THEN 1 ELSE 0 END) AS live_refs " +
        "FROM documents GROUP BY md5(text)) " +
        "WHERE live_refs = 0 GROUP BY 1 ORDER BY shard"),
    "multimodal_meta" ->
      ("SELECT doc_id, CAST(len(text) AS BIGINT) AS n_bytes, md5(text) AS digest, " +
        "CAST(64 + ascii(substr(text, 1, 1)) % 64 AS INT) AS width, " +
        "CAST(64 + ascii(substr(text, 2, 1)) % 64 AS INT) AS height, " +
        "3 AS channels FROM documents ORDER BY doc_id"),
    "frame_sample" ->
      ("SELECT doc_id, CAST(i AS INT) AS frame_idx, md5(substr(text, CAST(i * 64 + 1 AS INT), 16)) AS frame_md5 " +
        "FROM (SELECT doc_id, text, unnest(generate_series(0, CAST(floor((len(text) - 16) / 64) AS BIGINT))) AS i " +
        "FROM documents WHERE len(text) >= 16) ORDER BY doc_id, frame_idx"),
    "media_features" ->
      ("SELECT doc_id, CAST(len(text) AS BIGINT) AS n_bytes, " +
        "array_to_string(list_transform(generate_series(0, 15), j -> " +
        "len(list_filter(list_transform(generate_series(1, len(text)), " +
        "i -> ascii(substr(text, CAST(i AS INT), 1)) // 16), x -> x = j))), ',') AS hist " +
        "FROM documents WHERE len(text) > 0 ORDER BY doc_id"),
    "frame_dedup" ->
      ("SELECT frame_md5, count(DISTINCT doc_id) AS n_docs, min(doc_id) AS canonical_doc FROM " +
        "(SELECT doc_id, md5(substr(text, CAST(i * 64 + 1 AS INT), 16)) AS frame_md5 " +
        "FROM (SELECT doc_id, text, unnest(generate_series(0, CAST(floor((len(text) - 16) / 64) AS BIGINT))) AS i " +
        "FROM documents WHERE len(text) >= 16)) " +
        "GROUP BY frame_md5 HAVING count(DISTINCT doc_id) > 1 ORDER BY frame_md5"),
    "media_dedup" ->
      ("SELECT md5(text) AS digest, min(doc_id) AS keep_id, count(*) AS n_copies, " +
        "CAST(max(len(text)) AS BIGINT) AS n_bytes FROM documents " +
        "GROUP BY md5(text) ORDER BY keep_id"),
    "media_shard_manifest" ->
      ("SELECT substr(md5(text), 1, 1) AS shard, count(*) AS n_objects, " +
        "CAST(sum(len(text)) AS BIGINT) AS total_bytes, " +
        "count(DISTINCT md5(text)) AS n_distinct FROM documents " +
        "GROUP BY 1 ORDER BY shard"),
    "media_resize" ->
      ("SELECT doc_id, CAST(len(text) AS BIGINT) AS orig_bytes, " +
        "CAST((len(text) + 3) // 4 AS BIGINT) AS resized_bytes, " +
        "md5(array_to_string(list_transform(generate_series(0, (len(text) - 1) // 4), " +
        "i -> substr(text, CAST(i * 4 + 1 AS INT), 1)), '')) AS resized_digest " +
        "FROM documents ORDER BY doc_id"),
  )
}
