"""Deduplication operators for document corpora (engine components beyond
the reference's pair-join surface — first-class per the build brief):

- exact_dedup: content-hash groupby, deterministic representative (min id)
- minhash_lsh_pairs: shingle → minhash signature → banded LSH buckets →
  candidate pairs → exact shingle-Jaccard verification
- simhash_batch: 64-bit simhash per document (near-dup by Hamming distance)
- ngram-Jaccard exact near-dup reuses the prefix-filter join pipeline
  (``pipelines.join.jaccard_join`` on a shingled column).

All hash mixing is seeded and deterministic (no Python ``hash()``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_M61 = (1 << 61) - 1


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit hashes of tokens (md5-derived, platform independent)."""
    return np.fromiter(
        (int.from_bytes(hashlib.md5(t.encode()).digest()[:8], 'little')
         for t in tokens), dtype=np.uint64, count=len(tokens))


def shingles(text: str, k: int = 5) -> list[str]:
    """Word k-gram shingles (contiguous, space-joined)."""
    words = text.split()
    if len(words) < k:
        return [' '.join(words)] if words else []
    return [' '.join(words[i:i + k]) for i in range(len(words) - k + 1)]


# ------------------------------------------------------------- exact dedup

def exact_dedup(ds: ray.data.Dataset, id_col: str, text_col: str,
                normalize: bool = False) -> ray.data.Dataset:
    """(rep_id, dup_count) per distinct content hash — hash-partition +
    per-group min-id representative (SURVEY.md §2.6 pattern)."""

    def hash_batch(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        if normalize:
            texts = [' '.join((t or '').split()) for t in texts]
        h = [hashlib.md5((t or '').encode()).hexdigest() for t in texts]
        return pa.table({'content_hash': pa.array(h, pa.string()),
                         id_col: batch[id_col]})

    hashed = ds.map_batches(hash_batch, batch_format='pyarrow')

    def rep_group(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({'rep_id': [df[id_col].min()],
                             'dup_count': [len(df)]})
    rep_group.__name__ = 'dedup_rep'
    return hashed.groupby('content_hash').map_groups(rep_group,
                                                     batch_format='pandas')


# -------------------------------------------------------------- minhash LSH

class MinHasher:
    """num_perm universal-hash minhash over shingle hashes; seeded."""

    def __init__(self, num_perm: int = 64, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _M61, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _M61, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, token_hashes: np.ndarray) -> np.ndarray:
        if len(token_hashes) == 0:
            return np.full(self.num_perm, np.uint64(_M61), dtype=np.uint64)
        # (a*h + b) mod M61 with silent uint64 wrap on the product — a
        # deterministic universal-style mix (wrap changes the family, not
        # the minhash contract)
        h = token_hashes.astype(np.uint64)
        vals = (self.a[:, None] * h[None, :] + self.b[:, None]) \
            % np.uint64(_M61)
        return vals.min(axis=1)


class MinHashStage:
    """(id, text) → (id, sig list<uint64>) — actor-pool stage; permutation
    params built once per actor."""

    def __init__(self, id_col: str, text_col: str, k: int = 5,
                 num_perm: int = 64, seed: int = 42):
        self.id_col = id_col
        self.text_col = text_col
        self.k = k
        self.mh = MinHasher(num_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        sigs = []
        for t in texts:
            sh = shingles(t or '', self.k)
            sigs.append(self.mh.signature(_token_hashes(sh)).astype(np.int64))
        return pa.table({
            'id': batch[self.id_col],
            'sig': pa.array([s.tolist() for s in sigs],
                            type=pa.list_(pa.int64()))})


def minhash_lsh_pairs(ds: ray.data.Dataset, id_col: str, text_col: str,
                      threshold: float = 0.8, k: int = 5, num_perm: int = 64,
                      bands: int = 16, seed: int = 42) -> ray.data.Dataset:
    """Candidate pairs from banded LSH, verified with exact shingle-set
    Jaccard ≥ threshold.  Returns Dataset (l_id, r_id, jaccard) with
    l_id < r_id."""
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands

    sigs = ds.map_batches(MinHashStage(id_col, text_col, k, num_perm, seed),
                          batch_format='pyarrow')

    def band_postings(batch: pa.Table) -> pa.Table:
        ids = batch['id'].to_pylist()
        sig_lists = batch['sig'].to_pylist()
        out_ids, out_buckets = [], []
        for i, sig in enumerate(sig_lists):
            s = np.asarray(sig, dtype=np.int64)
            for b in range(bands):
                chunk = s[b * rows_per_band:(b + 1) * rows_per_band]
                digest = hashlib.md5(
                    chunk.tobytes() + bytes([b])).hexdigest()[:16]
                out_ids.append(ids[i])
                out_buckets.append(digest)
        return pa.table({'bucket': pa.array(out_buckets, pa.string()),
                         'id': pa.array(out_ids)})

    posts = sigs.map_batches(band_postings, batch_format='pyarrow')

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(df['id'].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({'l_id': [], 'r_id': []})
        li = np.repeat(ids, len(ids))
        ri = np.tile(ids, len(ids))
        m = li < ri
        return pd.DataFrame({'l_id': li[m], 'r_id': ri[m]})
    bucket_pairs.__name__ = 'lsh_bucket_pairs'

    cands = posts.groupby('bucket').map_groups(bucket_pairs,
                                               batch_format='pandas')

    def dedup_pair(df: pd.DataFrame) -> pd.DataFrame:
        return df.head(1)
    dedup_pair.__name__ = 'pair_dedup'
    cands = cands.groupby(['l_id', 'r_id']).map_groups(dedup_pair,
                                                       batch_format='pandas')

    # verify with exact shingle jaccard: broadcast the shingle sets when the
    # corpus is small, else join back (here: broadcast — documents carrying
    # verification fit per-node for the LSH-candidate volume)
    import ray as _ray
    shingle_map = {}
    for batch in ds.select_columns([id_col, text_col]).iter_batches(
            batch_format='pyarrow', batch_size=8192):
        for i, t in zip(batch[id_col].to_pylist(),
                        batch[text_col].to_pylist()):
            shingle_map[i] = set(shingles(t or '', k))
    ref = _ray.put(shingle_map)  # broadcast verify table; at corpus scales
    # where this no longer fits, swap for a bucketed join back to the docs

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        smap = _ray.get(ref)
        keep, js = [], []
        for l, r in zip(df['l_id'], df['r_id']):
            s1, s2 = smap[l], smap[r]
            if not s1 and not s2:
                j = 1.0
            elif not s1 or not s2:
                j = 0.0
            else:
                o = len(s1 & s2)
                j = o / (len(s1) + len(s2) - o)
            keep.append(j >= threshold)
            js.append(j)
        out = df.copy()
        out['jaccard'] = js
        return out[np.asarray(keep, bool)]

    return cands.map_batches(verify, batch_format='pandas')


# ------------------------------------------------------------------ simhash

def simhash64(text: str, k: int = 2) -> int:
    """64-bit simhash over word k-gram shingle hashes."""
    sh = shingles(text, k)
    if not sh:
        return 0
    hs = _token_hashes(sh)
    bits = np.zeros(64, dtype=np.int64)
    for h in hs:
        for b in range(64):
            bits[b] += 1 if (int(h) >> b) & 1 else -1
    out = 0
    for b in range(64):
        if bits[b] > 0:
            out |= (1 << b)
    return out


class SimHashStage:
    def __init__(self, id_col: str, text_col: str, k: int = 2):
        self.id_col, self.text_col, self.k = id_col, text_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        vals = np.fromiter((simhash64(t or '', self.k) for t in texts),
                           dtype=np.uint64, count=len(texts))
        return pa.table({'id': batch[self.id_col],
                         'simhash': pa.array(vals.astype(np.int64))})


def simhash_near_dup_pairs(ds: ray.data.Dataset, id_col: str, text_col: str,
                           max_hamming: int = 3, k: int = 2
                           ) -> ray.data.Dataset:
    """Near-dup pairs by simhash Hamming distance ≤ max_hamming, blocked on
    16-bit simhash quarters (a pair within distance 3 shares ≥1 of 4
    quarters by pigeonhole)."""
    sigs = ds.map_batches(SimHashStage(id_col, text_col, k),
                          batch_format='pyarrow')

    def quarter_postings(batch: pa.Table) -> pa.Table:
        ids = batch['id'].to_pylist()
        sh = batch['simhash'].to_numpy(zero_copy_only=False)
        out_b, out_i, out_s = [], [], []
        for i, h in enumerate(sh):
            hu = int(h) & 0xFFFFFFFFFFFFFFFF
            for q in range(4):
                part = (hu >> (16 * q)) & 0xFFFF
                out_b.append((q << 16) | part)
                out_i.append(ids[i])
                out_s.append(int(h))  # signed int64 representation
        return pa.table({'bucket': pa.array(out_b, pa.int64()),
                         'id': pa.array(out_i),
                         'simhash': pa.array(out_s, pa.int64())})

    posts = sigs.map_batches(quarter_postings, batch_format='pyarrow')

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        sub = df.drop_duplicates('id')
        ids = sub['id'].to_numpy()
        hs = sub['simhash'].to_numpy().astype(np.uint64)
        out_l, out_r = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = bin(int(hs[i]) ^ int(hs[j])).count('1')
                if d <= max_hamming:
                    a, b = sorted((ids[i], ids[j]))
                    out_l.append(a)
                    out_r.append(b)
        return pd.DataFrame({'l_id': out_l, 'r_id': out_r})
    pairs.__name__ = 'simhash_pairs'

    cand = posts.groupby('bucket').map_groups(pairs, batch_format='pandas')
    return cand.groupby(['l_id', 'r_id']).map_groups(
        lambda df: df.head(1), batch_format='pandas')
