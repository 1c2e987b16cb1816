#!/usr/bin/env python3
"""Build the round-17 sf1 scale-probe fixture: documents and embeddings
blown up 10x from sf0.1, everything else symlinked.

Design: copy 0 is the original corpus (preserves its real near-dup
structure); copies 1..9 perturb each row deterministically —
documents get a per-doc seeded word shuffle (destroys shingle overlap
across copies, so the corpus-wide duplicate RATE stays comparable to
sf0.1 instead of manufacturing 10-clone near-dup clusters that would
blow up every LSH bucket quadratically for data-distribution reasons),
embeddings get +-15% per-dimension jitter (outside near-dup cosine
thresholds, same dimensionality/scale distribution). Deterministic:
seed = 1000003 * copy + row id.

Usage: python3 tools/make_sf1_probe.py [outdir]  (default /tmp/sf1)
"""
import os
import random
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
COPIES = 10

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

docs = con.execute(
    f"SELECT doc_id, text, lang, source FROM '{SRC}/documents.parquet' "
    "ORDER BY doc_id").fetchall()
# offset by max(id)+1, NOT row count: sparse/non-zero-based ids would
# otherwise collide across copies (two (copy, doc) pairs mapping to one
# doc_id silently skews every dedup probe)
doc_off = max(d[0] for d in docs) + 1
rows = []
for k in range(COPIES):
    for doc_id, text, lang, source in docs:
        if k == 0:
            t = text
        else:
            rnd = random.Random(1000003 * k + doc_id)
            words = text.split(" ")
            rnd.shuffle(words)
            # ALSO mutate ~30% of tokens: shuffling alone defeats
            # shingle/sequence-based ops (MinHash, SimHash, substring)
            # but leaves token SETS identical, which hands set-based
            # ops (PPJoin) 10 set-identical clones per doc — a
            # quadratic-output fixture artifact, not a bound probe
            words = [w + str(k) if rnd.random() < 0.3 else w
                     for w in words]
            t = " ".join(words)
        rows.append((doc_id + k * doc_off, t, lang, source, len(t)))
con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
            "source VARCHAR, n_chars BIGINT)")
con.executemany("INSERT INTO d VALUES (?, ?, ?, ?, ?)", rows)
con.execute(f"COPY d TO '{OUT}/documents.parquet' (FORMAT PARQUET, "
            "COMPRESSION ZSTD)")

emb = con.execute(
    f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet' "
    "ORDER BY vec_id").fetchall()
vec_off = max(e[0] for e in emb) + 1
erows = []
for k in range(COPIES):
    for vec_id, vec, label in emb:
        if k == 0:
            v = vec
        else:
            rnd = random.Random(1000003 * k + vec_id)
            v = [x * (1.0 + 0.3 * (rnd.random() - 0.5)) for x in vec]
        erows.append((vec_id + k * vec_off, v, label))
con.execute("CREATE TABLE e (vec_id BIGINT, embedding FLOAT[], "
            "label INTEGER)")
con.executemany("INSERT INTO e VALUES (?, ?, ?)", erows)
con.execute(f"COPY e TO '{OUT}/embeddings.parquet' (FORMAT PARQUET, "
            "COMPRESSION ZSTD)")

# events 10x (round 18, the e42/e43 auto as-of router probe): copy 0
# verbatim, copies 1-9 keep user_id (so per-key row counts scale 10x —
# the skew the router must detect scales WITH the data) and shift ts by
# a tiny deterministic per-copy/per-row offset so copies don't tie on
# (user, ts); event_id offsets by max+1 like the other tables. As-of
# output is one row per left row, so replication cannot manufacture a
# quadratic-output artifact here (unlike the set-identical-clone trap
# documented above for PPJoin).
ev_off = con.execute(
    f"SELECT MAX(event_id) + 1 FROM '{SRC}/events.parquet'").fetchone()[0]
con.execute(f"""
    CREATE TABLE ev AS
    SELECT e.event_id + c.k * {ev_off} AS event_id,
           e.ts + to_microseconds(CAST(CASE WHEN c.k = 0 THEN 0
             ELSE c.k * 7919 + e.event_id % 997 END AS BIGINT)) AS ts,
           e.user_id, e.event_type, e.value, e.props
    FROM '{SRC}/events.parquet' e
    CROSS JOIN (SELECT unnest(range({COPIES})) AS k) c""")
con.execute(f"COPY ev TO '{OUT}/events.parquet' (FORMAT PARQUET, "
            "COMPRESSION ZSTD)")

for f in os.listdir(SRC):
    if f.endswith(".parquet") and f not in ("documents.parquet",
                                            "embeddings.parquet",
                                            "events.parquet"):
        dst = os.path.join(OUT, f)
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f), dst)
print(f"wrote {OUT}: {len(rows)} docs, {len(erows)} embeddings")
