#!/usr/bin/env python
"""Generate an sf1 (10x bench scale) soak dataset matching the driver's
sf0.1 distributions — for SCALING.md wall-time scaling measurements
ONLY (never for correctness oracles; the driver's testdata is
read-only and its generator is not ours to reproduce exactly).

documents: 50,000 rows, word-salad text drawn from the sf0.1 corpus's
own 31-word vocabulary at the same length distribution (10-100 words),
20 sources, 5 langs. embeddings: 20,000 rows, 64-dim unit vectors
around 10 cluster centers with intra-cluster spread fitted-by-eye to
sf0.1 (cosine structure is what the ANN/dedup queries bucket on).
Other tables are copied from sf0.1 (the soak queries don't read them).

Deterministic: seed 1337. Output: testdata_sf1/ (gitignored).
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
OUT = os.path.join(REPO, "testdata_sf1")

N_DOCS = 50_000
N_VECS = 20_000
DIM = 64
N_LABELS = 10


def main() -> None:
    rng = np.random.default_rng(1337)
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    vocab = [
        r[0]
        for r in con.execute(
            "SELECT DISTINCT word FROM (SELECT unnest(string_split(text, ' ')) "
            f"AS word FROM read_parquet('{SRC}/documents.parquet')) ORDER BY 1"
        ).fetchall()
    ]
    # word frequencies from the source corpus so gram statistics match
    freq = dict(con.execute(
        "SELECT word, count(*) FROM (SELECT unnest(string_split(text, ' ')) "
        f"AS word FROM read_parquet('{SRC}/documents.parquet')) GROUP BY 1"
    ).fetchall())
    p = np.array([freq[w] for w in vocab], dtype=np.float64)
    p /= p.sum()

    lengths = rng.integers(10, 101, size=N_DOCS)
    texts = [
        " ".join(rng.choice(vocab, size=n, p=p)) for n in lengths
    ]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(N_DOCS, dtype=np.int64),
            "text": texts,
            "lang": [f"lang{i % 5}" for i in rng.integers(0, 5, N_DOCS)],
            "source": [f"src{i}" for i in rng.integers(0, 20, N_DOCS)],
        }
    )
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    docs.to_parquet(os.path.join(OUT, "documents.parquet"), index=False)

    centers = rng.normal(size=(N_LABELS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, N_LABELS, size=N_VECS)
    vecs = centers[labels] + 0.6 * rng.normal(size=(N_VECS, DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(N_VECS, dtype=np.int64),
            "embedding": [v.astype(np.float32) for v in vecs],
            "label": labels.astype(np.int32),
        }
    )
    emb.to_parquet(os.path.join(OUT, "embeddings.parquet"), index=False)

    # events scale 10x by SERIES COUNT, not density (VERDICT r10 item 6:
    # the engine's store/ingest rows were excluded from the r10 soak
    # because only documents/embeddings scaled): 10 deterministic copies
    # of the sf0.1 stream, copy k > 0 renamed to ``<type>_k`` with its
    # own event_id block and a per-copy second-level ts jitter — the
    # point model (metric = event_type) then has 50 series over the same
    # 30-day window at the SAME per-series slot density, which is how a
    # metrics fleet actually grows (more series, not denser series)
    con.execute(
        f"""
        COPY (
          SELECT (k.k * 1000000000 + event_id) AS event_id,
                 ts + to_microseconds(((event_id * 7 + k.k * 13) % 11
                                       - 5) * 1000000) AS ts,
                 user_id,
                 CASE WHEN k.k = 0 THEN event_type
                      ELSE event_type || '_' || CAST(k.k AS VARCHAR)
                 END AS event_type,
                 value, props
          FROM read_parquet('{SRC}/events.parquet')
          CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS k) k
        ) TO '{os.path.join(OUT, "events.parquet")}' (FORMAT PARQUET)
        """
    )

    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        shutil.copyfile(
            os.path.join(SRC, f"{t}.parquet"),
            os.path.join(OUT, f"{t}.parquet"),
        )
    print(f"wrote {OUT}: {N_DOCS} docs, {N_VECS} embeddings, 1M events")


if __name__ == "__main__":
    sys.exit(main())
