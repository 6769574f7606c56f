"""Approximate-nearest-neighbor search over an embedding column
(``list<float>``).

- ``ann_topk_bruteforce``: exact cosine top-k per query — numpy matmul per
  batch against a broadcast query matrix (the baseline; one streaming pass,
  no shuffle; per-batch partial top-k merged on the driver).
- ``ann_topk_lsh``: random-hyperplane LSH variant (the scale path): vectors
  are bucketed by sign-pattern signatures, queries probe their own bucket(s),
  exact cosine within bucket — recall < 1, cost ≪ brute force.

Cosine computed in float64 with explicit dot/norm so a DuckDB
``list_cosine_similarity`` oracle matches to float precision.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    offs = col.offsets.to_numpy()
    dim = offs[1] - offs[0] if len(offs) > 1 else 0
    n = len(col)
    # embeddings are fixed-dim; reshape via offsets base
    return flat[offs[0]:offs[0] + n * dim].reshape(n, dim)


class BruteForceScore:
    """Per-batch exact cosine vs the broadcast query matrix; emits each
    batch's top-k rows per query (a combiner — the driver merges partials)."""

    def __init__(self, query_ref, id_col: str, vec_col: str, k: int):
        self.Q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) \
            else query_ref  # (m, d) float64, rows unit-normalized lazily
        self.qnorm = np.linalg.norm(self.Q, axis=1)
        self.id_col = id_col
        self.vec_col = vec_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _batch_matrix(batch, self.vec_col)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        if len(X) == 0:
            return pa.table({'query_id': pa.array([], pa.int64()),
                             'vec_id': pa.array([], pa.int64()),
                             'cosine': pa.array([], pa.float64())})
        xnorm = np.linalg.norm(X, axis=1)
        xnorm[xnorm == 0] = 1.0
        sims = (self.Q @ X.T) / (self.qnorm[:, None] * xnorm[None, :])
        k = min(self.k, sims.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[0]):
            idx = np.argpartition(-sims[qi], k - 1)[:k]
            out_q.append(np.full(k, qi, dtype=np.int64))
            out_v.append(ids[idx].astype(np.int64))
            out_s.append(sims[qi][idx])
        return pa.table({'query_id': pa.array(np.concatenate(out_q)),
                         'vec_id': pa.array(np.concatenate(out_v)),
                         'cosine': pa.array(np.concatenate(out_s))})


def ann_topk_bruteforce(ds: ray.data.Dataset, query_matrix: np.ndarray,
                        id_col: str = 'vec_id', vec_col: str = 'embedding',
                        k: int = 5) -> pd.DataFrame:
    """Exact top-k; returns (query_id, vec_id, cosine, rank) — ties broken
    by (−cosine, vec_id) for determinism."""
    Q = np.asarray(query_matrix, dtype=np.float64)
    qref = ray.put(Q)
    partials = ds.map_batches(BruteForceScore(qref, id_col, vec_col, k),
                              batch_format='pyarrow').to_pandas()
    rows = []
    for qi, grp in partials.groupby('query_id'):
        top = heapq.nsmallest(
            k, grp.itertuples(index=False),
            key=lambda r: (-r.cosine, r.vec_id))
        for rank, r in enumerate(top, 1):
            rows.append((int(qi), int(r.vec_id), float(r.cosine), rank))
    return pd.DataFrame(rows, columns=['query_id', 'vec_id', 'cosine',
                                       'rank'])


class HyperplaneSig:
    def __init__(self, dim: int, nbits: int = 12, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((nbits, dim))

    def sig(self, X: np.ndarray) -> np.ndarray:
        bits = (X @ self.planes.T) > 0
        return (bits @ (1 << np.arange(bits.shape[1]))).astype(np.int64)


def _probe_sigs(sig: int, nbits: int, probes: int) -> list[int]:
    """Multi-probe set: all signatures within Hamming radius ``probes``
    (radius <= 2 supported — the standard recall knob for sign-LSH)."""
    out = [sig]
    if probes >= 1:
        out += [sig ^ (1 << b) for b in range(nbits)]
    if probes >= 2:
        out += [sig ^ (1 << a) ^ (1 << b)
                for a in range(nbits) for b in range(a + 1, nbits)]
    return out


def ann_topk_lsh(ds: ray.data.Dataset, query_matrix: np.ndarray,
                 id_col: str = 'vec_id', vec_col: str = 'embedding',
                 k: int = 5, nbits: int = 8, seed: int = 42,
                 probes: int = 1) -> pd.DataFrame:
    """LSH-bucketed approximate top-k: vectors grouped by hyperplane
    signature; each query searched exactly within the buckets of its
    multi-probe set (Hamming radius ``probes`` around its own signature).
    Documented partitioning assumption: recall depends on bucket granularity
    (2^nbits buckets) and the probe radius — measured recall@10 vs brute
    force is the acceptance gate (tests/test_cluster_dedup_ann.py)."""
    Q = np.asarray(query_matrix, dtype=np.float64)
    dim = Q.shape[1]
    hasher = HyperplaneSig(dim, nbits, seed)
    q_sigs = hasher.sig(Q)
    # bucket -> query indices probing it
    probe_map: dict = {}
    for qi, s in enumerate(q_sigs):
        for b in _probe_sigs(int(s), nbits, probes):
            probe_map.setdefault(b, []).append(qi)
    href = ray.put(hasher)
    qref = ray.put((Q, probe_map))

    def bucket_batch(batch: pa.Table) -> pa.Table:
        h = ray.get(href)
        X = _batch_matrix(batch, vec_col)
        sigs = h.sig(X) if len(X) else np.array([], np.int64)
        return batch.append_column('bucket', pa.array(sigs))

    bucketed = ds.map_batches(bucket_batch, batch_format='pyarrow')

    def search_bucket(df: pd.DataFrame) -> pd.DataFrame:
        Qm, pmap = ray.get(qref)
        b = int(df['bucket'].iloc[0])
        qidx = np.asarray(pmap.get(b, ()), dtype=np.int64)
        if len(qidx) == 0:
            return pd.DataFrame({'query_id': [], 'vec_id': [], 'cosine': []})
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in df[vec_col]])
        ids = df[id_col].to_numpy()
        xnorm = np.linalg.norm(X, axis=1)
        xnorm[xnorm == 0] = 1.0
        rows_q, rows_v, rows_s = [], [], []
        for qi in qidx:
            sims = (X @ Qm[qi]) / (xnorm * np.linalg.norm(Qm[qi]))
            kk = min(k, len(sims))
            idx = np.argpartition(-sims, kk - 1)[:kk]
            rows_q.extend([qi] * kk)
            rows_v.extend(ids[idx])
            rows_s.extend(sims[idx])
        return pd.DataFrame({'query_id': rows_q, 'vec_id': rows_v,
                             'cosine': rows_s})
    search_bucket.__name__ = 'lsh_search_bucket'

    res = bucketed.groupby('bucket').map_groups(
        search_bucket, batch_format='pandas').to_pandas()
    rows = []
    for qi, grp in res.groupby('query_id'):
        top = heapq.nsmallest(k, grp.itertuples(index=False),
                              key=lambda r: (-r.cosine, r.vec_id))
        for rank, r in enumerate(top, 1):
            rows.append((int(qi), int(r.vec_id), float(r.cosine), rank))
    return pd.DataFrame(rows, columns=['query_id', 'vec_id', 'cosine',
                                       'rank'])
