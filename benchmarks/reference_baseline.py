#!/usr/bin/env python
"""Measured reference-vs-ours head-to-head on the reference's OWN synthetic
benchmark shape.

The reference repo publishes benchmark harnesses but no result numbers
(BASELINE.md §1), and its Cython kernels cannot be built here (no Cython in
the container).  What CAN run is its pure-Python join path
(`join/jaccard_join_py.py` → `join/set_sim_join.py`: token ordering, prefix
+ position filter, joblib process-parallel right-table slices), via the
minimal shims in ref_shims/ (six / pyprind / joblib / py_stringmatching —
our own code, written from public definitions).

Data follows the reference's asv synthetic benchmark definition
(`benchmarks/asv_benchmarks/benchmark_join_synthetic.py:15-38` +
`data_generator.py:8-45`): N rows per table, vocabulary of 5,000 random
tokens with length ~N(6,2), ~N(5,1) tokens per record, JACCARD t=0.7 on a
whitespace tokenizer.  Both engines run on the IDENTICAL pandas tables and
the output pair sets are asserted equal before any timing is reported.

Usage:  python benchmarks/reference_baseline.py
Env:    SSJ_REF_SIZE     rows per table        (default 10000 — asv 'small')
        SSJ_REF_NJOBS    reference n_jobs list (default "1,4,32")
        RAY_GRAFT_CPUS   Ray CPUs for our run  (default 32)
        SSJ_REF_MEASURES comma list of jaccard,cosine,edit_distance
                         (default "jaccard"); edit_distance runs the
                         reference's edit_distance_join_py (qgram-2 prefix
                         filter, threshold SSJ_REF_ED_T, default 2)

Prints one JSON line and is recorded in BASELINE.md §1b.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
REFERENCE = '/root/reference'

SIZE = int(os.environ.get('SSJ_REF_SIZE', '10000'))
NJOBS = [int(x) for x in
         os.environ.get('SSJ_REF_NJOBS', '1,4,32').split(',')]
NUM_CPUS = int(os.environ.get('RAY_GRAFT_CPUS', '32'))
THRESHOLD = 0.7
VOCAB_SIZE = 5000
TOKEN_LEN_MU, TOKEN_LEN_SIGMA = 6, 2
TOKENS_PER_REC_MU, TOKENS_PER_REC_SIGMA = 5, 1


def make_table(seed: int, size: int) -> pd.DataFrame:
    """Deterministic synthetic table with the asv generator's published
    parameters (vocab 5000, token len ~N(6,2), ~N(5,1) tokens/record)."""
    rng = np.random.RandomState(seed)
    letters = np.array(list('abcdefghijklmnopqrstuvwxyz'))
    lens = np.clip(rng.normal(TOKEN_LEN_MU, TOKEN_LEN_SIGMA,
                              VOCAB_SIZE).round().astype(int), 1, None)
    vocab = np.array([''.join(rng.choice(letters, ln)) for ln in lens])
    counts = np.clip(rng.normal(TOKENS_PER_REC_MU, TOKENS_PER_REC_SIGMA,
                                size).round().astype(int), 1, None)
    picks = rng.randint(0, VOCAB_SIZE, int(counts.sum()))
    offs = np.concatenate(([0], np.cumsum(counts)))
    texts = [' '.join(vocab[picks[offs[i]:offs[i + 1]]])
             for i in range(size)]
    return pd.DataFrame({'id': np.arange(size), 'text': texts})


def pair_key_set(df: pd.DataFrame, lcol: str, rcol: str) -> set:
    return set(zip(df[lcol].astype(np.int64), df[rcol].astype(np.int64)))


REPS = int(os.environ.get('SSJ_REF_REPS', '3'))
MEASURES = [m.strip() for m in
            os.environ.get('SSJ_REF_MEASURES', 'jaccard').split(',') if m]
ED_T = int(os.environ.get('SSJ_REF_ED_T', '2'))
# overlap_join's threshold is an absolute shared-token count, not a ratio
OVERLAP_T = int(os.environ.get('SSJ_REF_OVERLAP_T', '3'))


def run_reference(ltable, rtable, n_jobs, measure):
    """Best-of-REPS wall for the reference path (steady-state: imports and
    the joblib worker pool warm-up paid before the timed runs)."""
    sys.path.insert(0, os.path.join(HERE, 'ref_shims'))
    sys.path.insert(0, REFERENCE)
    from py_stringmatching.tokenizer.whitespace_tokenizer import \
        WhitespaceTokenizer
    if measure == 'jaccard':
        from py_stringsimjoin.join.jaccard_join_py import \
            jaccard_join_py as fn
        args = (WhitespaceTokenizer(return_set=True), THRESHOLD)
    elif measure == 'cosine':
        from py_stringsimjoin.join.cosine_join_py import cosine_join_py as fn
        args = (WhitespaceTokenizer(return_set=True), THRESHOLD)
    elif measure == 'dice':
        from py_stringsimjoin.join.dice_join_py import dice_join_py as fn
        args = (WhitespaceTokenizer(return_set=True), THRESHOLD)
    elif measure == 'overlap':
        from py_stringsimjoin.join.overlap_join_py import \
            overlap_join_py as fn
        args = (WhitespaceTokenizer(return_set=True), OVERLAP_T)
    elif measure == 'overlap_coefficient':
        from py_stringsimjoin.join.overlap_coefficient_join_py import \
            overlap_coefficient_join_py as fn
        args = (WhitespaceTokenizer(return_set=True), THRESHOLD)
    elif measure == 'edit_distance':
        from py_stringsimjoin.join.edit_distance_join_py import \
            edit_distance_join_py as fn
        args = (ED_T,)  # reference default: qgram-2 bag tokenizer
    else:
        raise ValueError(measure)
    best, out = float('inf'), None
    for _ in range(REPS):
        t0 = time.time()
        out = fn(ltable, rtable, 'id', 'id', 'text', 'text',
                 *args, n_jobs=n_jobs, show_progress=False)
        best = min(best, time.time() - t0)
    return best, out


def run_ours(ltable, rtable, measure):
    """Best-of-REPS wall for our path (steady-state: Ray init and the first
    Dataset execution's one-time machinery paid before the timed runs)."""
    import ray
    import ray.data
    if not ray.is_initialized():
        ray.init(address='local', num_cpus=NUM_CPUS,
                 include_dashboard=False, logging_level='ERROR')
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, REPO)
    from py_stringsimjoin_ray.core.tokenizers import WhitespaceTokenizer
    from py_stringsimjoin_ray.pipelines import join
    if measure == 'jaccard':
        def call():
            return join.jaccard_join(ltable, rtable, 'id', 'id', 'text',
                                     'text', WhitespaceTokenizer(
                                         return_set=True), THRESHOLD)
    elif measure == 'cosine':
        def call():
            return join.cosine_join(ltable, rtable, 'id', 'id', 'text',
                                    'text', WhitespaceTokenizer(
                                        return_set=True), THRESHOLD)
    elif measure == 'dice':
        def call():
            return join.dice_join(ltable, rtable, 'id', 'id', 'text',
                                  'text', WhitespaceTokenizer(
                                      return_set=True), THRESHOLD)
    elif measure == 'overlap':
        def call():
            return join.overlap_join(ltable, rtable, 'id', 'id', 'text',
                                     'text', WhitespaceTokenizer(
                                         return_set=True), OVERLAP_T)
    elif measure == 'overlap_coefficient':
        def call():
            return join.overlap_coefficient_join(
                ltable, rtable, 'id', 'id', 'text', 'text',
                WhitespaceTokenizer(return_set=True), THRESHOLD)
    elif measure == 'edit_distance':
        def call():
            return join.edit_distance_join(ltable, rtable, 'id', 'id',
                                           'text', 'text', ED_T)
    else:
        raise ValueError(measure)
    best, out = float('inf'), None
    for _ in range(REPS):
        # same call signature as the reference: pandas tables in, pandas out
        t0 = time.time()
        out = call()
        best = min(best, time.time() - t0)
    return best, out


def head_to_head(lt, rt, measure):
    ours_wall, ours_out = run_ours(lt, rt, measure)
    ours_pairs = pair_key_set(ours_out, 'l_id', 'r_id')

    ref = {}
    ref_pairs = None
    for nj in NJOBS:
        wall, out = run_reference(lt, rt, nj, measure)
        pairs = pair_key_set(out, 'l_id', 'r_id')
        if ref_pairs is None:
            ref_pairs = pairs
        assert pairs == ref_pairs, f'reference n_jobs={nj} pair set differs'
        ref[f'n_jobs={nj}'] = round(wall, 3)

    assert ours_pairs == ref_pairs, (
        f'{measure} pair sets differ: ours {len(ours_pairs)} vs ref '
        f'{len(ref_pairs)}; sym-diff {len(ours_pairs ^ ref_pairs)}')

    best_ref = min(ref.values())
    if measure == 'edit_distance':
        name = f'asv_synthetic_edit_distance_qg2_d{ED_T}'
    elif measure == 'overlap':
        name = f'asv_synthetic_overlap_ws_o{OVERLAP_T}'
    else:
        name = f'asv_synthetic_{measure}_ws_t{THRESHOLD}'
    return {
        'benchmark': name,
        'rows_per_table': SIZE,
        'pairs': len(ours_pairs),
        'reference_pure_python_sec': ref,
        'ours_ray_sec': round(ours_wall, 3),
        'ours_num_cpus': NUM_CPUS,
        'speedup_vs_best_reference': round(best_ref / ours_wall, 2),
        'reps_best_of': REPS,
    }


def main():
    lt = make_table(1, SIZE)
    rt = make_table(2, SIZE)
    # Two independent random tables produce ~0 pairs at t=0.7 (the asv
    # generator draws 5-token records from a 5,000-word vocabulary), which
    # would make the pair-set equality assert vacuous.  Copy 70% of left
    # rows (at shuffled positions) into the right table so the verify
    # phase does real work on both engines.
    rng = np.random.RandomState(3)
    mask = rng.rand(SIZE) < 0.7
    src = rng.permutation(SIZE)
    rt.loc[mask, 'text'] = lt['text'].to_numpy()[src[mask]]

    note = ('reference = public repo pure-Python path via shims '
            '(its Cython twins are not buildable in this container); '
            'pair sets asserted identical before timing; both engines '
            'best-of-REPS steady-state walls')
    for m in MEASURES:
        r = head_to_head(lt, rt, m)
        r['note'] = note
        if m == 'edit_distance':
            # the reference's real levenshtein kernel is py_stringmatching's
            # CYTHON implementation, not buildable here; the shim's pure-
            # Python DP stands in, so the reference walls below overstate its
            # true cost — report as PARITY evidence (identical pair sets),
            # not a speed comparison
            r['timing_comparable'] = False
            r['note'] = ('reference levenshtein dependency shimmed in pure '
                         'Python (real py_stringmatching ships Cython) — '
                         'pair-set parity asserted; reference walls are NOT '
                         'comparable; ' + note)
        print(json.dumps(r), flush=True)
    import ray
    ray.shutdown()


if __name__ == '__main__':
    main()
