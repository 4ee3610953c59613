"""Similarity search over the ``embeddings`` table (list<float> column).

* brute-force cosine top-k: numpy matmul per batch against a broadcast
  query matrix (``ray.put`` once, read per worker) — the exact baseline.
* LSH-bucketed ANN: random-hyperplane signatures bucket the corpus; probes
  only matching buckets — the scale path (documented recall tradeoff).
* embedding-cosine near-duplicate pairs: all-pairs above a threshold via
  blocked matmul.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
from ray.data import Dataset


def _embedding_matrix(batch: pd.DataFrame) -> np.ndarray:
    return np.stack(batch["embedding"].to_numpy()).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norms, 1e-12)


def brute_force_topk(
    embeddings: Dataset,
    queries: np.ndarray,
    k: int = 10,
) -> pd.DataFrame:
    """Exact cosine top-k: per-batch partial top-k against the broadcast
    query matrix, then a driver-side merge of the tiny partials.

    Scale shape: the corpus streams; only (n_queries × k) rows per batch
    reach the reduce.  Ties broken by smaller vec_id (deterministic).
    """
    qn = _normalize(np.asarray(queries, np.float64))
    q_ref = ray.put(qn)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(q_ref)
        m = _normalize(_embedding_matrix(batch))
        sims = q @ m.T  # (n_q, n_batch)
        ids = batch["vec_id"].to_numpy()
        n_take = min(k, sims.shape[1])
        idx = np.argpartition(-sims, n_take - 1, axis=1)[:, :n_take]
        out = []
        for qi in range(sims.shape[0]):
            out.append(
                pd.DataFrame(
                    {
                        "query_id": np.int64(qi),
                        "vec_id": ids[idx[qi]],
                        "score": sims[qi, idx[qi]],
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    partials = embeddings.map_batches(partial, batch_format="pandas").to_pandas()
    partials = partials.sort_values(
        ["query_id", "score", "vec_id"], ascending=[True, False, True]
    )
    return partials.groupby("query_id", as_index=False).head(k).reset_index(drop=True)


class LshAnnIndex:
    """Random-hyperplane LSH ANN (actor-pool state: planes + bucketed ids).

    ``n_planes`` signature bits per table; multiple tables raise recall.
    Built once per worker from a broadcast corpus sample or, at scale, from
    a bucketed parquet layout (bucket id = signature).
    """

    def __init__(self, corpus: pd.DataFrame, n_planes: int = 8, n_tables: int = 4, seed: int = 42):
        rng = np.random.RandomState(seed)
        m = _normalize(_embedding_matrix(corpus))
        self.ids = corpus["vec_id"].to_numpy()
        self.vecs = m
        dim = m.shape[1]
        self.planes = [rng.randn(n_planes, dim) for _ in range(n_tables)]
        self.tables: list[dict[int, np.ndarray]] = []
        for P in self.planes:
            sig = (m @ P.T > 0).astype(np.uint8)
            keys = np.packbits(sig, axis=1, bitorder="little")[:, 0].astype(np.int64)
            buckets: dict[int, list[int]] = {}
            for i, kk in enumerate(keys):
                buckets.setdefault(int(kk), []).append(i)
            self.tables.append({kk: np.array(v) for kk, v in buckets.items()})

    def query(self, q: np.ndarray, k: int = 10) -> pd.DataFrame:
        qn = _normalize(q.reshape(1, -1).astype(np.float64))[0]
        cands: set[int] = set()
        for P, table in zip(self.planes, self.tables):
            sig = (P @ qn > 0).astype(np.uint8)
            key = int(np.packbits(sig, bitorder="little")[0])
            cands.update(table.get(key, np.array([], np.int64)).tolist())
        if not cands:
            return pd.DataFrame({"vec_id": [], "score": []})
        ci = np.array(sorted(cands))
        sims = self.vecs[ci] @ qn
        order = np.lexsort((self.ids[ci], -sims))[:k]
        return pd.DataFrame({"vec_id": self.ids[ci][order], "score": sims[order]})


def near_duplicates_embedding(
    embeddings: Dataset, threshold: float = 0.95
) -> pd.DataFrame:
    """All pairs (a < b) with cosine ≥ threshold.

    Single-node baseline does a blocked matmul of the corpus against a
    broadcast copy of itself (O(n²) flops, O(n·d) memory per task); at
    scale swap the broadcast side for LSH buckets (same verify kernel).
    """
    full = embeddings.to_pandas()
    m = _normalize(_embedding_matrix(full))
    ids = full["vec_id"].to_numpy()
    m_ref = ray.put((m, ids))

    def block(batch: pd.DataFrame) -> pd.DataFrame:
        mm, all_ids = ray.get(m_ref)
        bm = _normalize(_embedding_matrix(batch))
        bids = batch["vec_id"].to_numpy()
        sims = bm @ mm.T
        rows, cols = np.nonzero(sims >= threshold)
        a, b = bids[rows], all_ids[cols]
        keep = a < b
        return pd.DataFrame({"vec_a": a[keep], "vec_b": b[keep]}).astype(
            {"vec_a": "int64", "vec_b": "int64"}
        )

    return (
        embeddings.map_batches(block, batch_format="pandas")
        .to_pandas()
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )
