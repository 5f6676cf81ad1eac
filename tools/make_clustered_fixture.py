"""Clustered-embedding fixture: a mixture-of-Gaussians ``embeddings``
table where ANN quantizers provably work.

The driver's synthetic embeddings are near-uniform on the sphere — the
hardest possible case for a 4-bit product quantizer (quantization noise
exceeds the cosine gaps between neighbors), which is why s8's recall on
that fixture reads as a failure even though its machinery is
oracle-exact (round-4 verdict). Real embedding corpora are CLUSTERED;
this fixture generates one deterministically:

  * ``k`` unit-norm cluster centers (seeded Gaussian draws),
  * ``n`` points = center + sigma * noise  (sigma=0.05 -> within-cluster
    cosine ~0.86, cross-cluster ~0.0 +- 0.12 — clearly separated),
  * cluster id = vec_id % k, so the first N_QUERIES ids cover distinct
    clusters and every query's true top-5 is same-cluster.

Written as ``<out>/embeddings.parquet`` with the testdata schema
(vec_id BIGINT, embedding FLOAT[], label INT = true cluster), so every
registry ANN query runs on it unchanged:

    python tools/make_clustered_fixture.py [out_dir] [n]
"""

from __future__ import annotations

import os
import sys

import numpy as np


def clustered_embeddings(
    n: int = 1024, k: int = 16, dim: int = 64, sigma: float = 0.05, seed: int = 7
) -> tuple[np.ndarray, np.ndarray]:
    """Return (vectors float32 [n, dim], cluster labels int32 [n])."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = np.arange(n) % k
    vecs = centers[labels] + sigma * rng.randn(n, dim)
    return vecs.astype(np.float32), labels.astype(np.int32)


def write_clustered_embeddings(out_dir: str, n: int = 1024, **kw) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    vecs, labels = clustered_embeddings(n=n, **kw)
    table = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    path = os.path.join(out_dir, "embeddings.parquet")
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(table, path)
    return path


def exact_topk(vecs: np.ndarray, n_queries: int, top_k: int) -> dict[int, set]:
    """Brute-force cosine ground truth (self excluded), numpy-side —
    independent of every Spark/DuckDB code path under test."""
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs[:n_queries] @ vecs.T) / np.outer(norms[:n_queries], norms)
    truth: dict[int, set] = {}
    for q in range(n_queries):
        sims[q, q] = -np.inf
        truth[q] = set(np.argsort(-sims[q])[:top_k].tolist())
    return truth


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scaled",
        "clustered",
    )
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    print(write_clustered_embeddings(out, n=n))
