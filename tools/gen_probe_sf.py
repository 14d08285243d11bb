#!/usr/bin/env python3
"""Builder-side generator for the LARGER scaling-probe SF (sf0.5 = 5x
sf0.1), written because the driver only ships sf{0.001,0.01,0.1} and the
round-12 verdict asks for one kernel-dominated data point.

Output: /root/repo/probedata/sf0.5/*.parquet (gitignored). NOT an oracle
surface -- bench/timing only; correctness stays gated on the driver SFs.

Scaling model (replica r in 0..4, per-table):
  - region/nation: copied (fixed dimensions).
  - customer/supplier/part/orders/lineitem: row replication with
    per-replica KEY OFFSETS on every join key, so per-key fan-in/fan-out
    (join selectivity, group sizes) is preserved exactly while distinct
    key counts scale 5x -- the same shape dbgen produces at higher SF.
  - events: replication with event_id/user_id offsets (per-user session
    structure preserved, 5x users).
  - documents: REGENERATED from the sf0.1 generative model (uniform draws
    from the same 31-word vocabulary at the same per-doc token counts,
    same (lang, source) marginals -- each source row contributes its
    length/lang/source 5x with fresh word draws, seed fixed). Plain
    replication would turn every doc into a 5-clique of exact duplicates
    and rewrite the dup-graph family's cost structure; regeneration keeps
    the collision RATE of the original process.
  - embeddings: replicated with vec_id offsets and a deterministic
    per-replica hash-noise perturbation (~1e-3/element) -- preserves the
    label/cluster geometry IVF depends on while breaking the exact
    5-duplicate degeneracy that would distort kNN/dedup-embedding ties.
"""
import os, sys
import duckdb

SRC = "/root/testdata/sf0.1"
_positional = [a for a in sys.argv[1:] if not a.startswith("--")]
DST = _positional[0] if _positional else "/root/repo/probedata/sf0.5"
R = int(next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--r=")), 5))

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
# setseed only governs random() per-thread; multi-threaded execution would
# interleave draws nondeterministically, so pin to one thread to make the
# regenerated documents table byte-reproducible run to run.
con.sql("SET threads=1")
con.sql("SELECT setseed(0.42)")

def write(name, sql):
    out = f"{DST}/{name}.parquet"
    con.sql(f"COPY ({sql}) TO '{out}' (FORMAT parquet)")
    n = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
    print(f"{name}: {n} rows")

rep = f"(SELECT unnest(range({R})) AS r)"

for t in ("region", "nation"):
    write(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

write("customer", f"""
  SELECT c_custkey + r*15000 AS c_custkey, * EXCLUDE (c_custkey, r)
  FROM '{SRC}/customer.parquet', {rep}""")
write("supplier", f"""
  SELECT s_suppkey + r*1000 AS s_suppkey, * EXCLUDE (s_suppkey, r)
  FROM '{SRC}/supplier.parquet', {rep}""")
write("part", f"""
  SELECT p_partkey + r*20000 AS p_partkey, * EXCLUDE (p_partkey, r)
  FROM '{SRC}/part.parquet', {rep}""")
write("orders", f"""
  SELECT o_orderkey + r*150000 AS o_orderkey, o_custkey + r*15000 AS o_custkey,
         * EXCLUDE (o_orderkey, o_custkey, r)
  FROM '{SRC}/orders.parquet', {rep}""")
write("lineitem", f"""
  SELECT l_orderkey + r*150000 AS l_orderkey, l_partkey + r*20000 AS l_partkey,
         l_suppkey + r*1000 AS l_suppkey, * EXCLUDE (l_orderkey, l_partkey, l_suppkey, r)
  FROM '{SRC}/lineitem.parquet', {rep}""")
write("events", f"""
  SELECT event_id + r*100000 AS event_id, user_id + r*1500 AS user_id,
         * EXCLUDE (event_id, user_id, r)
  FROM '{SRC}/events.parquet', {rep}""")

# embeddings: replicate + deterministic PER-ELEMENT hash-noise (zero noise
# on replica 0 so the original vectors survive verbatim). The noise must
# vary per dimension, not per vector: a constant per-vector shift moves the
# replica along the all-ones direction and leaves cosine(replica, source)
# ~1, keeping the exact-duplicate kNN/dedup-embedding degeneracy the
# perturbation exists to break.
write("embeddings", f"""
  SELECT vec_id + r*2000 AS vec_id,
         list_transform(embedding,
           (x, i) -> CAST(x + CASE WHEN r = 0 THEN 0.0
                ELSE (CAST(hash(vec_id*64*{R} + r*64 + i) % 2001 AS BIGINT) - 1000) / 1000000.0 END AS FLOAT)
         ) AS embedding,
         label
  FROM '{SRC}/embeddings.parquet', {rep}""")

# documents: regenerate text from the empirical vocabulary at the source
# row's token count; (lang, source, n-ish) marginals carried per replica.
# With --heaps, the vocabulary is EXTENDED to |V|·R^0.5 synthetic tokens
# (Heaps-law growth a real crawl corpus has) so shingle-collision density
# stays realistic instead of growing quadratically with corpus size --
# the variant that separates "operator superlinear" from "fixture
# vocabulary saturated".
con.sql(f"""
  CREATE TEMP TABLE vocab0 AS
  SELECT row_number() OVER (ORDER BY w) - 1 AS wid, w
  FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS w
        FROM '{SRC}/documents.parquet')""")
NV0 = con.sql("SELECT count(*) FROM vocab0").fetchone()[0]
if "--heaps" in sys.argv:
    NV = int(NV0 * R ** 0.5)
    con.sql(f"""
      CREATE TEMP TABLE vocab AS
      SELECT wid, w FROM vocab0
      UNION ALL
      SELECT {NV0} + x AS wid, 'hx' || x AS w
      FROM (SELECT unnest(range({NV - NV0})) AS x)""")
else:
    NV = NV0
    con.sql("CREATE TEMP TABLE vocab AS SELECT * FROM vocab0")
write("documents", f"""
  WITH base AS (
    SELECT doc_id + r*5000 AS doc_id, lang, source,
           len(string_split(text, ' ')) AS n_toks
    FROM '{SRC}/documents.parquet', {rep}),
  draws AS (
    SELECT doc_id, lang, source, unnest(range(n_toks)) AS pos
    FROM base),
  words AS (
    SELECT d.doc_id, d.lang, d.source, d.pos, v.w
    FROM (SELECT *, CAST(floor(random() * {NV}) AS BIGINT) % {NV} AS wid
          FROM draws) d
    JOIN vocab v USING (wid)),
  texts AS (
    SELECT doc_id, any_value(lang) AS lang, any_value(source) AS source,
           string_agg(w, ' ' ORDER BY pos) AS text
    FROM words GROUP BY doc_id)
  SELECT doc_id, text, lang, source, len(text) AS n_chars
  FROM texts ORDER BY doc_id""")

print(f"probe SF written to {DST}")
