package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("misraGries honors est <= exact and exact - est <= N/(k+1) on skewed data") {
    val rnd = new scala.util.Random(7)
    // Zipf-ish: key i gets ~N/i occurrences, shuffled
    val keys = rnd.shuffle(
      (1 to 40).flatMap(i => Seq.fill(4000 / i)(s"k$i")): Seq[String])
    val n = keys.size
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (k <- Seq(5, 16); parts <- Seq(1, 7)) {
      val est = TextAnalysis.misraGries(
        spark.createDataset(keys).repartition(parts), k)
        .as[(String, Long)].collect().toMap
      val bound = n.toDouble / (k + 1)
      exact.foreach { case (w, ex) =>
        val e = est.getOrElse(w, 0L)
        assert(e <= ex, s"k=$k parts=$parts $w: est $e overcounts exact $ex")
        assert(ex - e <= bound, s"k=$k parts=$parts $w: undercount ${ex - e} > $bound")
      }
      // no spurious keys
      assert(est.keySet.subsetOf(exact.keySet))
    }
  }

  test("charEntropy: 0 <= H <= ln(n_distinct), and counts cover the text") {
    val rows = TextAnalysis.charEntropy(spark, sf)
      .as[(Long, Long, Int, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, nd, h) =>
      assert(h >= 0.0, s"doc $id: negative entropy $h")
      assert(h <= math.log(nd.toDouble) + 1e-9,
        s"doc $id: H=$h exceeds ln($nd) uniform bound")
      assert(n > 0 && nd > 0)
    }
    // spot check one doc against a driver-side recount
    val (id0, n0, _, h0) = rows.head
    val text = graft.sources.Tables.documents(spark, sf)
      .filter($"doc_id" === id0).select("text").as[String].head()
    assert(text.length == n0)
    val counts = text.groupBy(identity).view.mapValues(_.size).values.toSeq
    val hRef = math.log(n0.toDouble) -
      counts.sorted.map(c => c * math.log(c.toDouble)).sum / n0
    assert(math.abs(h0 - hRef) < 1e-6)
  }

  test("ngramNovelty: first gram-bearing doc is fully novel; novel grams sum to the corpus vocabulary") {
    val rows = TextAnalysis.ngramNovelty(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, novel, frac) =>
      assert(novel >= 0 && novel <= n, s"doc $id: novel $novel out of [0,$n]")
      assert(frac == 1000000L * novel / n, s"doc $id: scaled frac mismatch")
    }
    // the lowest doc_id in the output saw the corpus first: every one of
    // its distinct grams has first_doc = itself
    val first = rows.minBy(_._1)
    assert(first._2 == first._3 && first._4 == 1000000L,
      s"first doc ${first._1} not fully novel: $first")
    // every gram is novel in exactly one doc, so novel_grams sums to the
    // corpus-wide distinct 5-gram count
    val vocab = graft.sources.Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.wordShingles($"text", 5)).as("g"))
      .select(countDistinct($"g")).as[Long].head()
    assert(rows.map(_._3).sum == vocab,
      s"novel sum ${rows.map(_._3).sum} != corpus vocab $vocab")
  }

  test("bm25TopTerms: ranks are 1..3 non-increasing; head score matches a driver-side recompute") {
    val rows = TextAnalysis.bm25TopTerms(spark, sf)
      .as[(Long, Int, String, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (id, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length), s"doc $id ranks broken")
      val scores = rs.sortBy(_._2).map(_._4)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"doc $id scores not non-increasing: ${scores.toSeq}")
    }
    // recompute the top term's score for one doc from raw token counts
    val (docId, _, word, got) = rows.head
    val toks = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", graft.functions.TextFunctions.tokens($"text").as("tk"))
      .as[(Long, Seq[String])].collect()
    val n = toks.length.toLong
    val tl = toks.map(_._2.length.toLong).sum
    val dl = toks.find(_._1 == docId).get._2.length.toLong
    val tf = toks.find(_._1 == docId).get._2.count(_ == word).toLong
    val df = toks.count(_._2.contains(word)).toLong
    val idfS = (1000000L * (2 * n - 2 * df + 1)) / (2 * df + 1)
    val tfS = (1000000L * 22 * tf * tl) / (10 * tf * tl + 3 * tl + 9 * dl * n)
    assert(got == idfS * tfS / 1000000L, s"doc $docId '$word': $got != ${idfS * tfS / 1000000L}")
  }

  test("dupGramFraction: dup_grams <= n_grams; a shared 5-gram is flagged on both docs") {
    val rows = TextAnalysis.dupGramFraction(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, dup, frac) =>
      assert(dup >= 0 && dup <= n, s"doc $id: dup $dup out of [0,$n]")
      assert(frac == 1000000L * dup / n, s"doc $id: scaled frac mismatch")
    }
    // cross-doc property on a controlled corpus: docs 1 and 2 share one
    // 5-gram, doc 3 shares nothing
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "eta alpha beta gamma delta epsilon theta"),
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val grams = docs
      .select($"doc_id", explode(graft.functions.TextFunctions.wordShingles($"text", 5)).as("g"))
    val nd = grams.groupBy("g").agg(countDistinct($"doc_id").as("ndocs"))
    val dupByDoc = grams.join(nd, "g").groupBy("doc_id")
      .agg(sum(when($"ndocs" >= 2, 1L).otherwise(0L)).as("dup"))
      .as[(Long, Long)].collect().toMap
    // doc1's grams: "alpha..epsilon", "beta..zeta"; only the first also
    // occurs in doc2
    assert(dupByDoc(1L) == 1L)
    assert(dupByDoc(2L) == 1L)
    assert(dupByDoc(3L) == 0L)
  }

  test("chunkDedupOf flags exactly the shared 64-token chunk on a controlled corpus") {
    // doc 1 and doc 2 share their first 64 tokens (chunk start 0); their
    // start-32 chunks differ (doc 2's tail diverges); doc 3 is unrelated.
    val shared = (1 to 64).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, shared + " " + (65 to 80).map(i => s"a$i").mkString(" ")),
      (2L, shared + " " + (65 to 80).map(i => s"b$i").mkString(" ")),
      (3L, (1 to 80).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDedupOf(docs)
      .as[(String, Long, Long, Long)].collect()
    assert(got.length == 1, s"expected one shared chunk, got ${got.toSeq}")
    val (_, nDocs, nOcc, canonical) = got.head
    assert(nDocs == 2 && nOcc == 2 && canonical == 1L)
  }

  test("phraseDetect: 50 rows, ranked, min-count honored, head score recomputable") {
    val rows = TextAnalysis.phraseDetect(spark, sf)
      .as[(String, String, Long, Long)].collect()
    assert(rows.length == 50)
    assert(rows.map(_._4).sliding(2).forall(p => p.head >= p.last),
      "score_ppm must be non-increasing")
    assert(rows.forall(_._3 > 5), "min-count c_xy > 5 must hold")
    // independent recount of the head row's ingredients
    val (w1, w2, cxy, score) = rows.head
    val tk = graft.sources.Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.tokens($"text")).as("w"))
    val n = tk.count()
    val c1 = tk.filter($"w" === w1).count()
    val c2 = tk.filter($"w" === w2).count()
    val cxyRef = graft.sources.Tables.documents(spark, sf)
      .select(graft.functions.TextFunctions.tokens($"text").as("tk"))
      .select(explode(expr(
        "transform(sequence(1, size(tk) - 1), i -> struct(tk[i-1] AS w1, tk[i] AS w2))")).as("b"))
      .filter($"b.w1" === w1 && $"b.w2" === w2)
      .count()
    assert(cxyRef == cxy)
    assert(score == 1000000L * (cxy - 5) * n / (c1 * c2))
  }

  test("curriculum_order: phases bucket quality deciles; order is keyed-hash stable") {
    val rows = TextAnalysis.curriculumOrder(spark, sf)
      .as[(Long, Int, Long)].collect()
    assert(rows.length == graft.sources.Tables.documents(spark, sf).count())
    val quality = TextAnalysis.qualityScore(spark, sf)
      .select("doc_id", "quality").as[(Long, Double)].collect().toMap
    rows.foreach { case (id, phase, key) =>
      assert(phase >= 0 && phase <= 9, s"doc $id: phase $phase")
      val expect = 9 - math.max(0, math.min(9, math.floor(quality(id) * 10).toInt))
      assert(phase == expect, s"doc $id: phase $phase != $expect for q=${quality(id)}")
      assert(key >= 0, s"doc $id: negative order key")
    }
    // rerun-stability: a second run schedules identically (keyed hash,
    // not rand()/row_number)
    val again = TextAnalysis.curriculumOrder(spark, sf)
      .as[(Long, Int, Long)].collect()
    assert(rows.toSeq == again.toSeq)
  }

  test("token_budget_select: cumulative totals are a true prefix sum; selection is a clean cut") {
    val rows = TextAnalysis.tokenBudgetSelect(spark, sf)
      .as[(Long, Int, Long, Long, Long, Int)].collect()
    assert(rows.length == graft.sources.Tables.documents(spark, sf).count())
    // cum_tokens must equal the running sum of n_tokens in output order
    var run = 0L
    rows.foreach { case (id, _, _, n, cum, _) =>
      run += n
      assert(cum == run, s"doc $id: cum $cum != running $run")
    }
    val budget = rows.map(_._4).sum / 3
    // selection is exactly the prefix cut at the budget: selected iff
    // cum <= budget, and once unselected never selected again
    rows.foreach { case (id, _, _, _, cum, sel) =>
      assert((sel == 1) == (cum <= budget), s"doc $id: cut violated at cum=$cum")
    }
    val flags = rows.map(_._6)
    assert(flags.zip(flags.tail).forall { case (a, b) => a >= b },
      "selection flag rose again after the cut")
    val picked = rows.filter(_._6 == 1)
    assert(picked.map(_._4).sum <= budget, "selected tokens exceed the budget")
    assert(picked.nonEmpty && picked.length < rows.length,
      "cut should be strictly inside the corpus at budget = total/3")
  }

  test("bpe_pair_counts: top-20 adjacent pairs, frequency-weighted, verified by recompute") {
    val rows = TextAnalysis.bpePairCounts(spark, sf)
      .as[(String, Long)].collect()
    assert(rows.length == 20)
    assert(rows.forall(_._1.length == 2), "pairs must be exactly 2 symbols")
    val counts = rows.map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      "counts must be non-increasing")
    // recompute the top pair's count from raw tokens on the driver
    val (topPair, topN) = rows.head
    val toks = graft.sources.Tables.documents(spark, sf)
      .select(graft.functions.TextFunctions.tokens($"text").as("tk"))
      .as[Seq[String]].collect()
    val ref = toks.iterator.flatMap(_.iterator)
      .map(w => w.sliding(2).count(_ == topPair)).sum
    assert(topN == ref, s"pair '$topPair': $topN != driver recompute $ref")
  }

  test("bpe_learn_merges: 5 rounds, step-1 equals the static top pair, max count non-increasing") {
    val rows = TextAnalysis.bpeLearnMerges(spark, sf)
      .as[(Int, String, String, Long)].collect()
    assert(rows.map(_._1).toSeq == (1 to 5), "steps must be 1..5 in order")
    // round 1 must elect exactly bpe_pair_counts' top entry (same counts,
    // and for single-char symbols the (a, b) tiebreak equals the
    // concatenated-pair tiebreak)
    val (topPair, topN) = TextAnalysis.bpePairCounts(spark, sf)
      .as[(String, Long)].head()
    val r1 = rows.head
    assert(r1._2 + r1._3 == topPair && r1._4 == topN,
      s"step 1 ${r1._2}+${r1._3}@${r1._4} != static top $topPair@$topN")
    // applying the winner can only shrink or preserve other pairs'
    // counts, so the elected maxima are non-increasing round over round
    val counts = rows.map(_._4)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"merge counts increased: ${counts.toSeq}")
    // the five merges are distinct rules
    assert(rows.map(r => (r._2, r._3)).distinct.length == 5)
  }

  test("bm25 DECIMAL kernel (huge-corpus path) is value-identical to the Long fast path") {
    val fast = TextAnalysis.bm25TopTermsImpl(spark, sf, forceDecimal = false)
      .as[(Long, Int, String, Long)].collect().toSeq
    val wide = TextAnalysis.bm25TopTermsImpl(spark, sf, forceDecimal = true)
      .as[(Long, Int, String, Long)].collect().toSeq
    assert(fast == wide, "the two overflow-safety kernels diverged")
  }

  test("bpe_encode: token counts bounded by words below and chars above; merges strictly compress") {
    val rows = TextAnalysis.bpeEncode(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, nWords, nChars, nBpe, ppm) =>
      assert(nBpe >= nWords, s"doc $id: fewer tokens than words")
      assert(nBpe <= nChars, s"doc $id: merges grew the symbol count")
      assert(ppm == 1000000L * nBpe / nChars, s"doc $id: compression ppm mismatch")
    }
    // the elected merges all have positive corpus counts, so corpus-wide
    // the encoding is STRICTLY smaller than the char baseline
    assert(rows.map(_._4).sum < rows.map(_._3).sum,
      "5 learned merges failed to compress the corpus at all")
  }

  test("bpe artifact: persisted merge table reloads stably and the build is idempotent") {
    // the contract the streaming twin and bpe_encode both stand on: the
    // trainer writes ONE parquet artifact per (session, dataset), marked
    // complete, and every reload returns the identical 5-row table
    val root = TextAnalysis.bpeIndexRoot(spark, sf)
    assert(new java.io.File(s"$root/.complete").exists(), "completion marker missing")
    assert(new java.io.File(s"$root/merges").exists(), "merges parquet missing")
    val first = TextAnalysis.bpeMergeTable(spark, sf)
    assert(first.size == 5 && first.map(_._1) == Seq(1, 2, 3, 4, 5))
    // second root request must be the memoized artifact, not a retrain
    assert(TextAnalysis.bpeIndexRoot(spark, sf) == root)
    assert(TextAnalysis.bpeMergeTable(spark, sf) == first)
  }

  test("gate-spec artifact: persisted thresholds + roster reproduce the batch gate exactly") {
    // the contract the streaming twin stands on: admission via the
    // SHIPPED files (quality > qt(lang) OR doc_id ∈ roster) equals
    // gateTopHalf's admitted set
    val root = TextAnalysis.gateSpecRoot(spark, sf)
    assert(new java.io.File(s"$root/.complete").exists(), "completion marker missing")
    val thresholds = spark.read.parquet(s"$root/thresholds").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val roster = spark.read.parquet(s"$root/roster").collect()
      .map(_.getLong(0)).toSet
    assert(thresholds.nonEmpty, "no thresholds in the artifact")
    val scored = TextAnalysis.scoredDocs(spark, sf)
      .select("doc_id", "lang", "quality").collect()
    val viaSpec = scored.filter { r =>
      val (id, lang, q) = (r.getLong(0), r.getString(1), r.getDouble(2))
      thresholds.get(lang).exists(q > _) || roster.contains(id)
    }.map(_.getLong(0)).toSet
    val viaBatch = TextAnalysis.qualityGate(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaSpec == viaBatch,
      s"spec-file admission diverged from the batch gate: " +
        s"${(viaSpec -- viaBatch).take(3)} vs ${(viaBatch -- viaSpec).take(3)}")
    // idempotent: a second root request reuses the memoized artifact
    assert(TextAnalysis.gateSpecRoot(spark, sf) == root)
  }

  test("bpe encode distributes over any corpus split (the streaming-twin equivalence)") {
    // encode(docs) == union over batches of encode(batch): per-doc rows
    // depend only on the doc's own words and the shipped merge table —
    // this is the property that makes foreachBatch append exact
    val merges = TextAnalysis.bpeMergeTable(spark, sf)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 120)
    val whole = TextAnalysis.bpeEncodeDocs(docs, merges)
      .collect().map(_.toString).sorted.toSeq
    val splits = Seq(
      docs.filter(col("doc_id") % 3 === 0),
      docs.filter(col("doc_id") % 3 === 1),
      docs.filter(col("doc_id") % 3 === 2))
    val parts = splits.flatMap(b =>
      TextAnalysis.bpeEncodeDocs(b, merges).collect().map(_.toString)).sorted
    assert(parts == whole, "batch-split encode diverged from the corpus pass")
  }

  test("bm25_model_refresh: merged model equals a from-scratch retrain") {
    import spark.implicits._
    val merged = TextAnalysis.bm25ModelRefresh(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(merged.nonEmpty)
    // scalars are constant across rows and equal the full-corpus truth
    assert(merged.map(r => (r._3, r._4)).distinct.length == 1)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("tk"))
      .as[(Long, Seq[String])].collect()
    val withToks = docs.filter(_._2.nonEmpty)
    assert(merged.head._3 == withToks.length, "n_docs != tokenized doc count")
    assert(merged.head._4 == withToks.map(_._2.length.toLong).sum, "total_tokens mismatch")
    // per-word df equals the direct document-frequency count
    val truth = withToks.flatMap { case (_, tk) => tk.distinct }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(merged.length == truth.size)
    merged.foreach { case (w, df, _, _) =>
      assert(truth(w) == df, s"df($w): merged $df vs retrain ${truth(w)}")
    }
  }

  test("chunk_retrieval: top-5 per query, at most 2 chunks per source doc, chunks on the grid") {
    import spark.implicits._
    val rows = TextAnalysis.chunkRetrieval(spark, sf)
      .as[(Long, Int, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_._1)
    byQ.foreach { case (q, rs) =>
      assert(rs.length <= 5 && rs.map(_._2).sorted.toSeq == (1 to rs.length),
        s"query $q: ranks not 1..k")
      assert(rs.map(_._3).groupBy(identity).values.forall(_.length <= 2),
        s"query $q: diversity cap violated")
      // >= 0, not > 0: a term weight legitimately floors to 0 (bm25 div
      // 1000) for near-ubiquitous terms, and zero-score chunks may then
      // fill a short top-5 on BOTH engines — that is correct behavior,
      // not a defect, so only negativity is impossible
      assert(rs.forall(_._5 >= 0), s"query $q: negative score")
      assert(!rs.exists(_._3 == q), s"query $q retrieved its own chunks")
    }
    assert(rows.exists(_._5 > 0), "no query found any positive-score chunk at this SF")
    // every retrieved (doc, chunk) exists on the doc_chunking grid
    val grid = TextAnalysis.docChunking(spark, sf)
      .select("doc_id", "chunk_id").as[(Long, Long)].collect().toSet
    rows.foreach { r =>
      assert(grid.contains((r._3, r._4)), s"chunk (${r._3},${r._4}) off-grid")
    }
  }
}
