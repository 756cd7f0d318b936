"""Planted-cluster embedding fixture for honest ANN recall floors.

The driver's synthetic embeddings are ISOTROPIC — every pair's cosine
sits in the random tail, the documented worst case for sublinear search,
and the pinned recall floors there (IVF 0.30, LSH 0.25) say little about
real corpora, which cluster. This generates the realistic counterpart: a
planted-cluster table where a >= 0.8 recall@10 floor is achievable and
meaningful (VERDICT r4 ask #2).

Layout (matches /root/testdata/*/embeddings.parquet exactly —
vec_id BIGINT, embedding FLOAT[64], label INT):
- 16 unit-vector cluster centers, deterministic seed.
- 2000 members: cluster = vec_id % 16, member = normalize(center +
  0.3 * noise/sqrt(64)) -> in-cluster cosine ~0.95, cross-cluster ~0.1.
- The round-robin assignment puts the 5 query vectors (vec_id < 5) in 5
  different clusters and spreads the 16 IVF seed centroids (vec_id
  5..20) across ALL 16 clusters, so the IVF index's cells line up with
  the planted structure the way trained centroids would on real data.

Writes tests/goldens/clustered/embeddings.parquet (committed fixture,
~0.5 MB). Run: PYTHONPATH=. python tools/gen_clustered_embeddings.py
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO_ROOT, "tests", "goldens", "clustered")

N_VECTORS = 2000
N_CLUSTERS = 16
DIM = 64
NOISE = 0.3
SEED = 20260814


def build() -> pa.Table:
    rng = np.random.default_rng(SEED)
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = np.arange(N_VECTORS) % N_CLUSTERS
    noise = rng.standard_normal((N_VECTORS, DIM)) / np.sqrt(DIM)
    vecs = centers[labels] + NOISE * noise
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(N_VECTORS), type=pa.int64()),
            "embedding": pa.array(
                [v for v in vecs], type=pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype(np.int32), type=pa.int32()),
        }
    )


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    table = build()
    pq.write_table(table, os.path.join(OUT_DIR, "embeddings.parquet"))
    print(f"wrote {OUT_DIR}/embeddings.parquet ({table.num_rows} rows)")


if __name__ == "__main__":
    main()
