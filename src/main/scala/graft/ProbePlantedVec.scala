package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r19 planted-nearest-neighbor recall probe for the VECTOR families
  * (r18 verdict order #3) — the embedding analogue of
  * [[ProbePlantedRecall]]: the ANN/embedding rows have recall evals
  * against exact ground truth at 1×, but at 10× they had only ever been
  * scale-tested on organic data with no planted truth. Over the corpus
  * `tools/gen_planted_vec.py` writes (20 exact-copy pairs, 20 cosine≈.995
  * near-dup pairs, 10 cosine≈.9995 planted query-neighbors), this probe
  * drives the REGISTERED rows end-to-end and checks each family against
  * its own contract:
  *
  *  - `dedup_embedding` (LSH generate → cosine verify): an exact copy
  *    shares every hyperplane sign, so both bands collide and cosine 1
  *    passes the ≥ 0.5 gate — 100%, ASSERTED. Near-dup candidacy is
  *    probabilistic (2 bands × 8 planes at θ ≈ 0.1 rad ⇒ pair surfaces
  *    w.p. ≈ 1−(1−(1−θ/π)⁸)² ≈ 0.998) — measured; every miss must be
  *    EXPLAINED by a measured band-key disagreement (zero shared
  *    (band, key) slots), else the screen lost a candidate it hashed
  *    together and the probe FAILS.
  *  - `dedup_semantic` (SemDeDup: within-cell keep-first at cos ≥ τ):
  *    exact copies share the nearest centroid by construction, so the
  *    later id must be dropped — 100%, ASSERTED. Near-dups are asserted
  *    only when co-resident (same cell); split-cell pairs are the
  *    documented SemDeDup cross-cell blind spot — measured and
  *    reported, with the split verified from the emitted assignments.
  *  - `ivf_search` (nprobe = 2 as configured): each planted neighbor
  *    sits at cosine ≈ 1−1e-8 of its query — 1.000000 at the engine's
  *    6-dp ranking precision, strictly above every organic candidate
  *    (the 10× corpus's replicated base vectors reach ≈ .999992; the
  *    probe's first run planted at .9995 and the engine CORRECTLY
  *    ranked organics first — a probe-truth bug, not an engine one) —
  *    so it must surface at rank 1 UNLESS its assigned cell fell
  *    outside the query's probed cells (the classic recall/cost
  *    trade). Found + explained-by-pruning must cover all 10; an
  *    unexplained miss FAILS the probe.
  *
  * Emits one JSON line with planted/found/explained per family and
  * exits 1 on any broken contract. */
object ProbePlantedVec {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/probedata/sf1.0h_planted_vec")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity

    val truth = spark.read.parquet(s"$sfDir/planted_vec_pairs.parquet")
    def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sfDir)
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val failures = Seq.newBuilder[String]

    // ---- dedup_embedding: LSH candidates + cosine gate ----
    val ((embJson), tEmb) = timed {
      val found = q("dedup_embedding")
        .select(col("id1").cast("long"), col("id2").cast("long"))
      val pairs = truth.filter(col("family").isin("exact", "near"))
      val hit = pairs.join(found,
        pairs("id1") === found("id1") && pairs("id2") === found("id2"),
        "left_semi")
      val planted = pairs.groupBy("family").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = hit.groupBy("family").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      if (got.getOrElse("exact", 0L) != planted("exact"))
        failures += s"dedup_embedding/exact: found ${got.getOrElse("exact", 0L)} of ${planted("exact")}"
      // every NEAR miss must show zero shared band keys — the screen's
      // own hash must agree it never co-bucketed the pair
      val missedNear = pairs.filter(col("family") === "near")
        .join(hit, Seq("family", "id1", "id2"), "left_anti")
        .select(col("id1").cast("long"), col("id2").cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val unexplained =
        if (missedNear.isEmpty) 0L
        else {
          // 2 bands × 8 planes: mirrors Similarity's Bands/RowsPerBand
          val keys = Similarity.annBandedKeys(
              Similarity.emb(spark, sfDir), 2, 8)
            .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2)))
            .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
          missedNear.count { case (a, b) =>
            keys.getOrElse(a, Set.empty).intersect(
              keys.getOrElse(b, Set.empty)).nonEmpty
          }
        }
      if (unexplained > 0)
        failures += s"dedup_embedding/near: $unexplained misses share a band key (screen lost a generated candidate)"
      s""""emb_exact": {"planted": ${planted("exact")}, "found": ${got.getOrElse("exact", 0L)}}, """ +
        s""""emb_near": {"planted": ${planted("near")}, "found": ${got.getOrElse("near", 0L)}, "missed_explained_by_banding": ${missedNear.length - unexplained}, "unexplained": $unexplained}"""
    }

    // ---- dedup_semantic: within-cell keep-first ----
    val (semJson, tSem) = timed {
      val verdicts = q("dedup_semantic")
        .select(col("vec_id").cast("long"), col("cell"), col("kept"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      val pairs = truth.filter(col("family").isin("exact", "near"))
        .select(col("family"), col("id1").cast("long"), col("id2").cast("long"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      var exOk, nearOk, nearSplit = 0
      pairs.foreach { case (fam, a, b) =>
        val (ca, _) = verdicts(a); val (cb, kb) = verdicts(b)
        if (fam == "exact") {
          if (ca != cb) failures += s"dedup_semantic: exact pair ($a,$b) split cells $ca/$cb — identical vectors MUST co-assign"
          else if (kb) failures += s"dedup_semantic: exact dup $b kept despite co-resident $a"
          else exOk += 1
        } else {
          if (ca != cb) nearSplit += 1 // the documented cross-cell trade
          else if (kb) failures += s"dedup_semantic: co-resident near-dup $b kept (cos≈.995 ≥ τ)"
          else nearOk += 1
        }
      }
      s""""sem_exact": {"planted": 20, "dropped": $exOk}, """ +
        s""""sem_near": {"planted": 20, "dropped_coresident": $nearOk, "cell_split": $nearSplit}"""
    }

    // ---- ivf_search: planted neighbor at nprobe=2 ----
    val (ivfJson, tIvf) = timed {
      val res = q("ivf_search")
        .select(col("qid").cast("long"), col("cand_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val qnn = truth.filter(col("family") === "qnn")
        .select(col("id1").cast("long"), col("id2").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val probed = Similarity.ivfProbeCells(spark, sfDir)
        .select(col("qid").cast("long"), col("cell").cast("long"))
        .collect().groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap
      val cells = q("dedup_semantic")
        .select(col("vec_id").cast("long"), col("cell").cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      var found = 0; var pruned = 0
      qnn.foreach { case (qid, b) =>
        if (res.contains((qid, b))) found += 1
        else if (!probed.getOrElse(qid, Set.empty).contains(cells(b))) pruned += 1
        else failures += s"ivf_search: planted neighbor $b of query $qid in a PROBED cell but not returned"
      }
      s""""ivf_qnn": {"planted": ${qnn.length}, "found": $found, "missed_explained_by_pruning": $pruned}"""
    }

    val bad = failures.result()
    val verdict = if (bad.isEmpty) "PASS" else "FAIL"
    println(
      s"""{"probe": "planted_vec", "sf": "$sfDir", "verdict": "$verdict", """ +
        s""""families": {$embJson, $semJson, $ivfJson}, """ +
        s""""wall_s": {"embedding": ${f"$tEmb%.1f"}, "semantic": ${f"$tSem%.1f"}, "ivf": ${f"$tIvf%.1f"}}, """ +
        s""""missed": [${bad.map("\"" + _ + "\"").mkString(",")}]}""")
    spark.stop()
    if (bad.nonEmpty) sys.exit(1)
  }
}
