#!/usr/bin/env python3
"""Documents-only 100x heaps corpus for the r18 ceiling probe.

Same generative model as gen_probe_sf.py --heaps (regenerated word soup
from the sf0.1 vocabulary extended by Heaps-law growth |V|*sqrt(R), so
shingle-collision density stays crawl-realistic), restricted to the
documents table: the two ceiling kernels (dedup_substring,
chunk_postings) read nothing else, and the full-table replication at
R=100 would write ~2 GB of TPC-H rows nothing reads. Seeded +
single-threaded for byte-reproducibility, like the parent script."""
import os, sys
import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/probedata/sf10h"
R = int(next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--r=")), 100))

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.sql("SET threads=1")
con.sql("SELECT setseed(0.42)")

con.sql(f"""
  CREATE TEMP TABLE vocab0 AS
  SELECT row_number() OVER (ORDER BY w) - 1 AS wid, w
  FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS w
        FROM '{SRC}/documents.parquet')""")
NV0 = con.sql("SELECT count(*) FROM vocab0").fetchone()[0]
NV = int(NV0 * R ** 0.5)
con.sql(f"""
  CREATE TEMP TABLE vocab AS
  SELECT wid, w FROM vocab0
  UNION ALL
  SELECT {NV0} + x AS wid, 'hx' || x AS w
  FROM (SELECT unnest(range({NV - NV0})) AS x)""")

rep = f"(SELECT unnest(range({R})) AS r)"
out = f"{DST}/documents.parquet"
con.sql(f"""
  COPY (
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
    FROM texts ORDER BY doc_id
  ) TO '{out}' (FORMAT parquet)""")
n = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
print(f"documents: {n} rows -> {out} (|V| {NV0} -> {NV})")
