#!/usr/bin/env python3
"""Build a scaled-up replica corpus from a driver testdata dir (tooling
only — the library never reads this script's output unless pointed at
it). Usage:

    python3 tools/make_scale_corpus.py /root/testdata/sf0.1 /tmp/sfscale1 10

Replicates documents.parquet and embeddings.parquet R times with
disjoint id ranges. Replica k>0 suffixes every word with a letter salt
(so replicas are NOT near-duplicates of each other — per-replica dup
structure is preserved, total work scales with R instead of pair counts
exploding quadratically on planted clusters) and adds deterministic
hash noise to embeddings (so replicas are not cosine-identical). All
other tables are copied through unchanged.
"""
import os
import shutil
import string
import sys

import duckdb

SRC, DST, R = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(DST, exist_ok=True)

for f in os.listdir(SRC):
    if f.endswith(".parquet") and f not in ("documents.parquet", "embeddings.parquet"):
        shutil.copy(os.path.join(SRC, f), os.path.join(DST, f))

con = duckdb.connect()
OFF = 1_000_000

doc_parts = []
for k in range(R):
    salt = "q" + string.ascii_lowercase[k % 26] + (string.ascii_lowercase[k // 26] if k >= 26 else "")
    if k == 0:
        doc_parts.append(f"SELECT doc_id, text, lang, source, n_chars FROM src_docs")
    else:
        doc_parts.append(
            f"SELECT doc_id + {k * OFF} AS doc_id, "
            f"regexp_replace(text, '([a-z]+)', '\\1{salt}', 'g') AS text, "
            f"lang, source, CAST(length(regexp_replace(text, '([a-z]+)', '\\1{salt}', 'g')) AS BIGINT) AS n_chars "
            f"FROM src_docs")
con.sql(f"CREATE VIEW src_docs AS SELECT * FROM '{SRC}/documents.parquet'")
con.sql(" UNION ALL ".join(doc_parts)).write_parquet(os.path.join(DST, "documents.parquet"))

emb_parts = []
for k in range(R):
    if k == 0:
        emb_parts.append("SELECT vec_id, embedding, label FROM src_emb")
    else:
        emb_parts.append(
            f"SELECT vec_id + {k * OFF} AS vec_id, "
            f"list_transform(embedding, x -> CAST(x + 0.02 * (CAST(hash(vec_id * 131 + {k} * 7) % 100 AS DOUBLE) / 100.0 - 0.5) AS FLOAT)) AS embedding, "
            f"label FROM src_emb")
con.sql(f"CREATE VIEW src_emb AS SELECT * FROM '{SRC}/embeddings.parquet'")
con.sql(" UNION ALL ".join(emb_parts)).write_parquet(os.path.join(DST, "embeddings.parquet"))

n_docs = con.sql(f"SELECT count(*) FROM '{DST}/documents.parquet'").fetchone()[0]
n_emb = con.sql(f"SELECT count(*) FROM '{DST}/embeddings.parquet'").fetchone()[0]
print(f"wrote {DST}: {n_docs} documents, {n_emb} embeddings ({R}x {SRC})")
