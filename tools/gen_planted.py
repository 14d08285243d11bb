#!/usr/bin/env python3
"""Planted-duplicate corpus for the r18 recall-at-scale probe.

The regenerated 10x corpus (probedata/sf1.0h) legitimately yields zero
setsim pairs, so the sub-quadratic dedup screens have only ever been
scale-tested while finding NOTHING. This tool writes a variant corpus
with a controlled, disjoint dup population whose ground truth is known
by construction, so graft.ProbePlantedRecall can assert end-to-end
recall per family at 10x:

  - 20 EXACT pairs (a,b): text(b) := text(a). Jaccard 1 -> guaranteed
    for dedup_exact, dedup_setsim_join (PPJoin is exact at J>=1/2) and
    dedup_minhash_lsh (identical signatures share every band).
  - 20 HI near-dup pairs: text(b) := text(a) + 3 pair-unique tokens
    (3 novel 3-grams) -> J = G/(G+3) ~ 0.93-0.95. In-threshold for
    setsim (exact contract); near-certain LSH candidates (reported).
  - 10 LO near-dup pairs: append floor(2G/3) pair-unique tokens ->
    J ~ 0.60: the threshold-region case PPJoin must still find exactly
    (its prefix filter is lossless), while LSH recall is probabilistic
    (1-(1-J^2)^4 ~ 76%, reported not asserted).
  - 10 SUBSTRING pairs: fully-synthetic doc pairs (unique filler
    tokens, so zero organic window recurrence) sharing one ~119-char
    token span (> SubK=40) at different offsets. dedup_substring's
    window anchoring is exact: each doc must report exactly one span
    covering the shared chars (+<=2 boundary spaces).
  - 3 LINE groups x 5 synthetic docs: 32 unique filler tokens with one
    shared 8-token line at grid position 2 (the reflow grid is 8-token
    aligned, so the planted tokens sit at token offsets 8..15).
    Recurrence 5 >= LineDupK=3: line_dedup_apply must cut exactly that
    line in all 5; keep_first must spare exactly the min-doc_id copy.

All planted ids are disjoint from each other; synthetic docs use fresh
ids above the organic range. Truth tables land next to the corpus:
planted_pairs.parquet (family, id1, id2), planted_substring.parquet
(doc_id, span_chars), planted_lines.parquet (grp, doc_id, is_keeper).

NOT an oracle surface -- bench/probe only, like every probedata SF.
"""
import os, sys
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/probedata/sf1.0h"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/probedata/sf1.0h_planted"
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

EXACT = [(1000 + 2 * i, 30000 + 2 * i) for i in range(20)]
HI = [(2000 + 2 * i, 32000 + 2 * i) for i in range(20)]
LO = [(3000 + 2 * i, 34000 + 2 * i) for i in range(10)]

a_ids = [a for a, _ in EXACT + HI + LO]
texts = dict(con.sql(
    f"SELECT doc_id, text FROM '{SRC}/documents.parquet' "
    f"WHERE doc_id IN ({','.join(map(str, a_ids))})").fetchall())

def distinct_grams(text):
    t = text.split(" ")
    return len({(t[i], t[i + 1], t[i + 2]) for i in range(len(t) - 2)})

repl = []  # (doc_id, new_text)
pairs = []  # (family, id1, id2)
for a, b in EXACT:
    repl.append((b, texts[a]))
    pairs.append(("exact", a, b))
for i, (a, b) in enumerate(HI):
    extra = " ".join(f"pshi{i}t{j}" for j in range(3))
    repl.append((b, texts[a] + " " + extra))
    pairs.append(("hi", a, b))
for i, (a, b) in enumerate(LO):
    g = distinct_grams(texts[a])
    m = max(1, (2 * g) // 3)
    extra = " ".join(f"pslo{i}t{j}" for j in range(m))
    repl.append((b, texts[a] + " " + extra))
    pairs.append(("lo", a, b))

# fully-synthetic substring pairs: ids 200000+, one shared span per pair
sub_rows = []   # docs (doc_id, text)
sub_truth = []  # (doc_id, span_chars)
for i in range(10):
    span = " ".join(f"spn{i}w{j}" for j in range(15))
    c1, c2 = 200000 + 2 * i, 200001 + 2 * i
    f1 = [f"sfa{c1}w{j}" for j in range(60)]
    f2 = [f"sfb{c2}w{j}" for j in range(60)]
    t1 = " ".join(f1[:20] + [span] + f1[20:])
    t2 = " ".join(f2[:35] + [span] + f2[35:])
    # ground truth = the EXACT shared region, not just the span: the
    # identical substring extends over the boundary spaces and the
    # common 'sf' filler prefix, and the engine's window anchoring
    # finds precisely that maximal region (the first probe run reported
    # 113 for a 109-char span and was RIGHT -- the truth was off)
    i1, i2 = t1.index(span), t2.index(span)
    lext = 0
    while i1 - lext - 1 >= 0 and i2 - lext - 1 >= 0 and \
            t1[i1 - lext - 1] == t2[i2 - lext - 1]:
        lext += 1
    rext = 0
    e1, e2 = i1 + len(span), i2 + len(span)
    while e1 + rext < len(t1) and e2 + rext < len(t2) and \
            t1[e1 + rext] == t2[e2 + rext]:
        rext += 1
    shared = lext + len(span) + rext
    sub_rows += [(c1, t1), (c2, t2)]
    sub_truth += [(c1, shared), (c2, shared)]

# synthetic line groups: ids 300000+, 32 tokens = 4 reflow lines, the
# shared 8-token line at token offsets 8..15 (grid line pos=2)
line_rows = []   # (doc_id, text)
line_truth = []  # (grp, doc_id, is_keeper)
for g in range(3):
    shared = [f"lg{g}w{j}" for j in range(8)]
    members = [300000 + 10 * g + k for k in range(5)]
    for k, did in enumerate(members):
        filler = [f"lf{did}w{j}" for j in range(24)]
        toks = filler[:8] + shared + filler[8:]
        line_rows.append((did, " ".join(toks)))
        line_truth.append((g, did, did == min(members)))

lang, source = con.sql(
    f"SELECT lang, source FROM '{SRC}/documents.parquet' LIMIT 1").fetchone()

con.sql("CREATE TEMP TABLE repl (doc_id BIGINT, text VARCHAR)")
con.executemany("INSERT INTO repl VALUES (?, ?)", repl)
con.sql("CREATE TEMP TABLE newdocs (doc_id BIGINT, text VARCHAR)")
con.executemany("INSERT INTO newdocs VALUES (?, ?)", sub_rows + line_rows)

con.sql(f"""
  COPY (
    SELECT d.doc_id, coalesce(r.text, d.text) AS text, d.lang, d.source,
           len(coalesce(r.text, d.text)) AS n_chars
    FROM '{SRC}/documents.parquet' d LEFT JOIN repl r USING (doc_id)
    UNION ALL
    SELECT doc_id, text, '{lang}' AS lang, '{source}' AS source,
           len(text) AS n_chars
    FROM newdocs
    ORDER BY doc_id
  ) TO '{DST}/documents.parquet' (FORMAT parquet)""")

con.sql("CREATE TEMP TABLE tp (family VARCHAR, id1 BIGINT, id2 BIGINT)")
con.executemany("INSERT INTO tp VALUES (?, ?, ?)", pairs)
con.sql(f"COPY tp TO '{DST}/planted_pairs.parquet' (FORMAT parquet)")
con.sql("CREATE TEMP TABLE ts (doc_id BIGINT, span_chars BIGINT)")
con.executemany("INSERT INTO ts VALUES (?, ?)", sub_truth)
con.sql(f"COPY ts TO '{DST}/planted_substring.parquet' (FORMAT parquet)")
con.sql("CREATE TEMP TABLE tl (grp BIGINT, doc_id BIGINT, is_keeper BOOLEAN)")
con.executemany("INSERT INTO tl VALUES (?, ?, ?)", line_truth)
con.sql(f"COPY tl TO '{DST}/planted_lines.parquet' (FORMAT parquet)")

n = con.sql(f"SELECT count(*) FROM '{DST}/documents.parquet'").fetchone()[0]
print(f"planted corpus: {n} docs -> {DST}")
print(f"pairs: {len(pairs)} (20 exact / 20 hi / 10 lo), "
      f"substring docs: {len(sub_truth)}, line docs: {len(line_truth)}")
