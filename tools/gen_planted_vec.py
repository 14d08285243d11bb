#!/usr/bin/env python3
"""Planted-nearest-neighbor embedding corpus (r18 verdict order #3).

The vector families (dedup_embedding / dedup_semantic / ivf_search) have
recall EVALS against exact ground truth at 1x, but no planted-known-
neighbor probe at 10x — the vector analogue of the r18 text planted-
recall probe. This tool writes a 10x embeddings variant with a planted
population whose ground truth is known by construction, for
graft.ProbePlantedVec:

  - 20 EXACT pairs (a, b): embedding(b) := embedding(a), b a fresh id.
    Identical vectors share every LSH plane and the same nearest
    centroid, so dedup_embedding (candidate + cosine 1 >= 0.5) and
    dedup_semantic (same cell, cos >= tau, keep-first) must both find
    them — exact contracts, assert 100%.
  - 20 NEAR pairs: embedding(b) := unit-consistent perturbation of
    embedding(a) at cosine ~0.995. LSH candidacy is probabilistic
    (16 planes, 2 bands of 8: P(pair surfaces) ~= 1-(1-(1-theta/pi)^8)^2
    ~ 0.999 at theta ~= 0.1 rad); misses must be explained by MEASURED
    band-key disagreement only. Cell co-residency is likewise
    probabilistic (the SemDeDup trade): same-cell pairs are exact
    contracts for dedup_semantic, split-cell pairs are reported.
  - 10 QNN neighbors: for each fixed query vector q (vec_id < 10), a
    planted neighbor at cosine ~1-1e-8 under a fresh id — rounds to
    1.000000 at the engine's 6-dp ranking precision, strictly above
    every organic candidate (the 10x corpus's replicated base vectors
    sit at ~0.999992; the probe's first run planted at 0.9995 and the
    engine CORRECTLY ranked organics first). ivf_search (nprobe=2 as
    configured) must surface it at rank 1 unless the neighbor's
    assigned cell fell outside the query's probed cells — the only
    legitimate excuse, checked per miss.

r20 adds the COMPOSED serving paths (r19 verdict order #2):

  - 10 HYB docs (id 43000+q, one per panel query q < 10), planted in
    BOTH tables: embedding := perturbation of q's vector at cosine
    ~1-1e-8 (rounds to 1.000000 at the engine's 6-dp precision, and
    43000+q < 44000+q so it wins the qnn plant's tie-break -> vector
    rank 1 whenever its cell is probed), and document text := q's
    predicted top-3 BM25 query terms repeated 6x (short doc stacked
    with all three high-idf terms -> intended lexical rank 1). The
    probe MEASURES both leg ranks from the engine's own legs; where
    the doc measures both-legs-best, hybrid_rrf_ivf must fuse it to
    rank 1 (RRF arithmetic: 2x div(1e12, 61) strictly dominates), and
    every planted id's fused presence/rank must match the RRF
    arithmetic applied to its measured leg ranks. The term prediction
    here is a float BM25 mirror (k1=1.2, b=0.75, the engine's
    non-log idf) — only plant QUALITY depends on it, never truth:
    a mispredicted term just means that query measures lex rank > 1
    and the both-best assertion doesn't arm for it.
  - The qnn plants double as the VECTOR-ONLY fusion contract: no
    document row exists for 44000+q, so its fused rank must match
    RRF arithmetic with a lex-absent leg.

Planted ids start at 40000 (organic 10x range is 0..19999). Truth ->
planted_vec_pairs.parquet (family, id1, id2). embeddings.parquet and
documents.parquet are written: the probed operators read no other
table.

NOT an oracle surface — bench/probe only, like every probedata SF.
"""
import os
import random
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/probedata/sf1.0h"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/probedata/sf1.0h_planted_vec"
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

rng = random.Random(20260816)

EXACT = [(1000 + i, 40000 + i) for i in range(20)]
NEAR = [(2000 + i, 42000 + i) for i in range(20)]
# HYB ids sort BELOW the qnn ids so that at the shared rounded cosine of
# 1.000000 the hyb plant takes vector rank 1 (tie-break cand_id asc) and
# the qnn plant rank 2 — deterministic leg ranks for the fusion probe.
HYB = [(q, 43000 + q) for q in range(10)]
QNN = [(q, 44000 + q) for q in range(10)]

src_ids = sorted({a for a, _ in EXACT + NEAR + HYB + QNN})
vecs = dict(con.sql(
    f"SELECT vec_id, embedding FROM '{SRC}/embeddings.parquet' "
    f"WHERE vec_id IN ({','.join(map(str, src_ids))})").fetchall())


def perturb(v, target_cos):
    """v + alpha*r with |alpha*r| = tan(theta)*|v| -> cos ~= target."""
    import math
    norm_v = math.sqrt(sum(x * x for x in v))
    r = [rng.gauss(0, 1) for _ in v]
    # remove the component along v so the perturbation is orthogonal and
    # the cosine comes out exactly at cos(theta)
    dot = sum(x * y for x, y in zip(r, v))
    r = [x - dot * y / (norm_v * norm_v) for x, y in zip(r, v)]
    norm_r = math.sqrt(sum(x * x for x in r))
    tan_t = math.tan(math.acos(target_cos))
    scale = tan_t * norm_v / norm_r
    return [float(x + scale * y) for x, y in zip(v, r)]


rows = []   # (vec_id, embedding, label)
pairs = []  # (family, id1, id2)
for a, b in EXACT:
    rows.append((b, [float(x) for x in vecs[a]], -1))
    pairs.append(("exact", a, b))
for a, b in NEAR:
    rows.append((b, perturb(vecs[a], 0.995), -1))
    pairs.append(("near", a, b))
for q, b in HYB:
    rows.append((b, perturb(vecs[q], 1 - 1e-8), -1))
    pairs.append(("hyb", q, b))
for q, b in QNN:
    rows.append((b, perturb(vecs[q], 1 - 1e-8), -1))
    pairs.append(("qnn", q, b))

# ---- hyb document side: predicted top-3 BM25 query terms, repeated ----
# Mirror of the engine's integer BM25 (TextAnalysis.bm25Exprs) in floats:
# idf = (N - df + 0.5)/(df + 0.5) (NON-log, the engine's integer-friendly
# variant), tf-component = 2.2*tf / (tf + 0.3 + 0.9*dl*N/TL). Used ONLY
# to choose plant text; the probe measures the engine's actual leg ranks.
tok = ("list_filter(string_split_regex(regexp_replace(text, '[^\\w\\s]+', "
       "'', 'g'), '\\s+'), t -> len(t) > 0)")
qterm_rows = con.sql(f"""
  WITH d AS (SELECT doc_id, {tok} AS tk FROM '{SRC}/documents.parquet'),
  tf AS (SELECT doc_id, unnest(tk) AS word FROM d),
  tfc AS (SELECT doc_id, word, count(*) AS tf FROM tf GROUP BY 1, 2),
  dfc AS (SELECT word, count(*) AS df FROM tfc GROUP BY 1),
  dl AS (SELECT doc_id, sum(tf) AS dl FROM tfc GROUP BY 1),
  tot AS (SELECT count(*) AS n, sum(dl) AS tl FROM dl),
  scored AS (
    SELECT tfc.doc_id, tfc.word,
      ((tot.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
      (2.2 * tfc.tf / (tfc.tf + 0.3 + 0.9 * dl.dl * tot.n / tot.tl)) AS bm25
    FROM tfc JOIN dfc USING (word) JOIN dl USING (doc_id) CROSS JOIN tot
    WHERE tfc.doc_id < 10)
  SELECT doc_id, word FROM (
    SELECT doc_id, word,
      row_number() OVER (PARTITION BY doc_id
                         ORDER BY bm25 DESC, word ASC) AS rn
    FROM scored) WHERE rn <= 3 ORDER BY doc_id, rn""").fetchall()
qterms = {}
for doc_id, word in qterm_rows:
    qterms.setdefault(doc_id, []).append(word)

doc_rows = []  # (doc_id, text, lang, source, n_chars)
for q, b in HYB:
    text = " ".join(t for t in qterms[q] for _ in range(6))
    doc_rows.append((b, text, "en", "planted", len(text)))

con.sql("CREATE TEMP TABLE newdocs (doc_id BIGINT, text VARCHAR, "
        "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
con.executemany("INSERT INTO newdocs VALUES (?, ?, ?, ?, ?)", doc_rows)
con.sql(f"""
  COPY (
    SELECT doc_id, text, lang, source, n_chars
    FROM '{SRC}/documents.parquet'
    UNION ALL SELECT doc_id, text, lang, source, n_chars FROM newdocs
    ORDER BY doc_id
  ) TO '{DST}/documents.parquet' (FORMAT parquet)""")

con.sql("CREATE TEMP TABLE newvecs (vec_id BIGINT, embedding FLOAT[], label INTEGER)")
con.executemany("INSERT INTO newvecs VALUES (?, ?, ?)", rows)
con.sql(f"""
  COPY (
    SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet'
    UNION ALL SELECT vec_id, embedding, label FROM newvecs
    ORDER BY vec_id
  ) TO '{DST}/embeddings.parquet' (FORMAT parquet)""")

con.sql("CREATE TEMP TABLE tp (family VARCHAR, id1 BIGINT, id2 BIGINT)")
con.executemany("INSERT INTO tp VALUES (?, ?, ?)", pairs)
con.sql(f"COPY tp TO '{DST}/planted_vec_pairs.parquet' (FORMAT parquet)")

n = con.sql(f"SELECT count(*) FROM '{DST}/embeddings.parquet'").fetchone()[0]
nd = con.sql(f"SELECT count(*) FROM '{DST}/documents.parquet'").fetchone()[0]
print(f"planted vec corpus: {n} vectors, {nd} docs -> {DST}")
print(f"pairs: {len(pairs)} (20 exact / 20 near / 10 hyb / 10 qnn)")
for q in sorted(qterms):
    print(f"  q{q} terms: {qterms[q]}")
