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

Planted ids start at 40000 (organic 10x range is 0..19999). Truth ->
planted_vec_pairs.parquet (family, id1, id2). Only embeddings.parquet
is written: the probed operators read no other table.

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
QNN = [(q, 44000 + q) for q in range(10)]

src_ids = sorted({a for a, _ in EXACT + NEAR + QNN})
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
for q, b in QNN:
    rows.append((b, perturb(vecs[q], 1 - 1e-8), -1))
    pairs.append(("qnn", q, b))

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
print(f"planted vec corpus: {n} vectors -> {DST}")
print(f"pairs: {len(pairs)} (20 exact / 20 near / 10 qnn)")
