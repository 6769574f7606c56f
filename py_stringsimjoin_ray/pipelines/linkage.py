"""The north-star pipeline: blocking + pairwise scoring + transitive
clustering record linkage over a source-code-repos Parquet corpus
(BASELINE.json north_rule), resumable via per-stage lineage manifests.

    repos.parquet ─ingest(map_batches: record_id, sha256)─▶ ingest/
      └▶ self-join (tokenize → ordering → prefix postings + salting →
         groupby(bucket) pair-gen/verify)              ─▶ matches/
      └▶ connected components (large-star/small-star)  ─▶ clusters/
           (+ singleton completion via groupby-min, sha256 carried through
            a hash join back to the ingest artifact)

Each stage writes partitioned Parquet + ``_manifest.json`` (input
fingerprint, row counts, sha256 roll-up); a re-run skips stages whose
manifest matches — kill the driver mid-run and the next run picks up after
the last completed artifact.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..core.tokenizers import WhitespaceTokenizer
from ..stages.cluster import connected_components
from ..state import manifests as mf
from .join import _JoinConfig, match_pairs_dataset


def _ingest_batch(batch: pa.Table) -> pa.Table:
    """Add record_id (deterministic 63-bit hash of (repo, path, commit) —
    dense global numbering is deliberately not reproduced at scale,
    SURVEY.md §7.4) and the per-row sha256(content) invariant column."""
    repos = batch['repo'].to_pylist()
    paths = batch['path'].to_pylist()
    commits = batch['commit'].to_pylist()
    contents = batch['content'].to_pylist()
    rids = np.empty(len(repos), dtype=np.int64)
    shas = []
    for i in range(len(repos)):
        key = f'{repos[i]}\x00{paths[i]}\x00{commits[i]}'.encode()
        rids[i] = int.from_bytes(hashlib.sha1(key).digest()[:8],
                                 'little') & 0x7FFFFFFFFFFFFFFF
        shas.append(hashlib.sha256((contents[i] or '').encode()).hexdigest())
    return batch.append_column('record_id', pa.array(rids)) \
                .append_column('sha256', pa.array(shas, pa.string()))


def record_linkage(repos_path: str, checkpoint_dir: str | None = None,
                   threshold: float = 0.7, tokenizer=None,
                   num_buckets: int = 512, salt_df_threshold: int = 20000,
                   join_num_partitions: int = 16,
                   counter_name: str | None = None) -> dict:
    """Run the full pipeline; returns a result dict with the cluster Dataset
    (lazy), per-stage counters, and the sha256 invariant check."""
    tokenizer = tokenizer or WhitespaceTokenizer(return_set=True)
    counters: dict = {}

    # ---------------- stage 1: ingest --------------------------------
    fp_in = mf.file_fingerprint(repos_path)
    if mf.is_complete(checkpoint_dir, 'ingest', fp_in):
        ingest = mf.read_stage(checkpoint_dir, 'ingest')
        counters['ingest_resumed'] = True
    else:
        raw = ray.data.read_parquet(repos_path)
        ingest = raw.map_batches(_ingest_batch, batch_format='pyarrow')
        if checkpoint_dir:
            ingest = mf.write_stage(ingest, checkpoint_dir, 'ingest', fp_in,
                                    sha_col='sha256')
        else:
            ingest = ingest.materialize()
    ingest_manifest = (mf.load_manifest(checkpoint_dir, 'ingest')
                       if checkpoint_dir else None)
    fp_ingest = fp_in + ':ingest'

    # ---------------- stage 2: matches (self-join) -------------------
    if mf.is_complete(checkpoint_dir, 'matches', fp_ingest):
        matches = mf.read_stage(checkpoint_dir, 'matches')
        counters['matches_resumed'] = True
    else:
        cfg = _JoinConfig('JACCARD', tokenizer, threshold, '>=',
                          allow_empty=False, allow_missing=False,
                          out_sim_score=True, self_join=True,
                          num_buckets=num_buckets,
                          salt_df_threshold=salt_df_threshold,
                          counter_name=counter_name)
        pairs, _ = match_pairs_dataset(ingest, ingest, 'record_id',
                                       'record_id', 'content', 'content', cfg)

        def cast_pairs(batch: pa.Table) -> pa.Table:
            return pa.table({
                'l_id': pa.compute.cast(batch['l_key'], pa.int64()),
                'r_id': pa.compute.cast(batch['r_key'], pa.int64()),
                'score': pa.compute.cast(batch['_sim_score'], pa.float64())})
        matches = pairs.map_batches(cast_pairs, batch_format='pyarrow')
        if checkpoint_dir:
            matches = mf.write_stage(matches, checkpoint_dir, 'matches',
                                     fp_ingest)
        else:
            matches = matches.materialize()
    counters['num_matches'] = matches.count()

    # ---------------- stage 3: clusters ------------------------------
    fp_matches = fp_ingest + ':matches'
    if mf.is_complete(checkpoint_dir, 'clusters', fp_matches):
        clusters = mf.read_stage(checkpoint_dir, 'clusters')
        counters['clusters_resumed'] = True
    else:
        edges = matches.map_batches(
            lambda b: pa.table({'u': b['l_id'], 'v': b['r_id']}),
            batch_format='pyarrow')
        comp = connected_components(edges)
        comp = comp.map_batches(
            lambda b: pa.table({'record_id': b['node'],
                                'component': b['component']}),
            batch_format='pyarrow')
        # singleton completion: every record not in any component maps to
        # itself — expressed as a groupby-min over (id→id) ∪ components
        base = ingest.map_batches(
            lambda b: pa.table({'record_id': b['record_id'],
                                'component': b['record_id']}),
            batch_format='pyarrow')
        membership = base.union(comp).groupby('record_id').min('component')
        membership = membership.map_batches(
            lambda b: pa.table({'record_id': b['record_id'],
                                'component': b['min(component)']}),
            batch_format='pyarrow')
        # hash-join the cluster id back onto the full ingest rows so the
        # final artifact carries repo/path/commit/sha256 per row
        clusters = ingest.select_columns(
            ['record_id', 'repo', 'path', 'commit', 'sha256']).join(
                membership, join_type='inner',
                num_partitions=join_num_partitions, on=('record_id',))
        if checkpoint_dir:
            clusters = mf.write_stage(clusters, checkpoint_dir, 'clusters',
                                      fp_matches, sha_col='sha256')
        else:
            clusters = clusters.materialize()

    counters['num_records'] = clusters.count()

    # ---------------- invariant: sha256 preserved end-to-end ---------
    if checkpoint_dir:
        m_in = mf.load_manifest(checkpoint_dir, 'ingest')
        m_out = mf.load_manifest(checkpoint_dir, 'clusters')
        counters['sha256_invariant_ok'] = (
            m_in and m_out and m_in.get('sha256_xor') == m_out.get('sha256_xor'))
    else:
        counters['sha256_invariant_ok'] = (
            mf.sha256_xor_rollup(ingest) == mf.sha256_xor_rollup(clusters))
    if ingest_manifest:
        counters['ingest_rows'] = ingest_manifest['num_rows']

    return {'clusters': clusters, 'counters': counters}


# ------------------------------------------------------------- evaluation

def pairwise_f1(clusters_pd, truth_pd, blocking_tokens_of=None) -> dict:
    """Pairwise precision/recall/F1 of predicted vs true clusters over
    labeled pairs that share a blocking key (BASELINE.md §2).

    clusters_pd: (repo, path, commit, component); truth_pd: (repo, path,
    commit, cluster_id).  The labeled-pair universe is all record pairs
    sharing ≥1 blocking token (default: a whitespace token of the record's
    truth cluster — here we use pairs from either clustering, which
    over-covers the universe and therefore can only lower the score)."""
    import pandas as pd
    key = ['repo', 'path', 'commit']
    merged = truth_pd.merge(clusters_pd, on=key, validate='one_to_one')

    def pair_set(labels):
        groups: dict = {}
        for i, lab in enumerate(labels):
            groups.setdefault(lab, []).append(i)
        pairs = set()
        for members in groups.values():
            for a in range(len(members)):
                for b in range(a + 1, len(members)):
                    pairs.add((members[a], members[b]))
        return pairs

    true_pairs = pair_set(merged['cluster_id'].to_numpy())
    pred_pairs = pair_set(merged['component'].to_numpy())
    tp = len(true_pairs & pred_pairs)
    precision = tp / len(pred_pairs) if pred_pairs else 1.0
    recall = tp / len(true_pairs) if true_pairs else 1.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return {'precision': precision, 'recall': recall, 'f1': f1,
            'true_pairs': len(true_pairs), 'pred_pairs': len(pred_pairs)}
