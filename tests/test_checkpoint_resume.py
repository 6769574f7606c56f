"""Kill-resume tests for the STANDALONE join and dedup entry points
(VERDICT r2 #4): the pair stream checkpoints as partitioned Parquet +
lineage manifest, a matching fingerprint skips the pipeline, and a
fingerprint change invalidates the artifact (mirrors
tests/test_linkage.py's stage-resume tests)."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from py_stringsimjoin_ray import WhitespaceTokenizer, jaccard_join
from py_stringsimjoin_ray.stages import dedup
from py_stringsimjoin_ray.state import manifests as mf


def _docs(n=120, seed=3):
    rng = np.random.default_rng(seed)
    words = [f'w{i}' for i in range(30)]
    base = [' '.join(rng.choice(words, 12)) for _ in range(n // 2)]
    texts = base + [t + ' extra' for t in base]  # planted near-dups
    return pd.DataFrame({'doc_id': np.arange(len(texts), dtype=np.int64),
                         'text': texts})


def test_jaccard_join_checkpoint_resume(person_tables, tmp_path,
                                        monkeypatch):
    A, B = person_tables
    tok = WhitespaceTokenizer(return_set=True)
    ckpt = str(tmp_path / 'join_ckpt')
    args = (A, B, 'A.ID', 'B.ID', 'A.name', 'B.name', tok, 0.3)
    plain = jaccard_join(*args, allow_missing=True)
    r1 = jaccard_join(*args, allow_missing=True, checkpoint_dir=ckpt)
    m = mf.load_manifest(ckpt, 'pairs')
    assert m and m['completed'] and m['num_rows'] == len(plain)

    # resume must NOT re-run the pipeline: poison match_pairs_dataset
    import py_stringsimjoin_ray.pipelines.join as J

    def boom(*a, **k):  # pragma: no cover - must not be called
        raise AssertionError('pipeline re-ran despite completed checkpoint')
    monkeypatch.setattr(J, 'match_pairs_dataset', boom)
    r2 = jaccard_join(*args, allow_missing=True, checkpoint_dir=ckpt)
    monkeypatch.undo()

    def key_set(df):
        return set(zip(df['l_A.ID'], df['r_B.ID']))
    assert key_set(r1) == key_set(plain) == key_set(r2)
    # per-pair scores survive the parquet round trip (NaN == NaN)
    s1 = {(l, r): s for l, r, s in zip(r1['l_A.ID'], r1['r_B.ID'],
                                       r1['_sim_score'])}
    for l, r, s in zip(r2['l_A.ID'], r2['r_B.ID'], r2['_sim_score']):
        e = s1[(l, r)]
        assert (np.isnan(s) and np.isnan(e)) or s == e

    # changed parameters -> different fingerprint -> recompute, not reuse
    r3 = jaccard_join(*args[:-1], 0.9, checkpoint_dir=ckpt)
    assert len(r3) < len(r1)
    # dataset-output resume reads the artifact too
    ds = jaccard_join(*args, allow_missing=True, checkpoint_dir=ckpt,
                      output='dataset')
    assert isinstance(ds, ray.data.Dataset)
    got = ds.to_pandas()
    assert set(zip(got['l_key'], got['r_key'])) == key_set(plain)


def test_minhash_lsh_checkpoint_resume(tmp_path, monkeypatch, ray_session):
    docs = ray.data.from_pandas(_docs())
    ckpt = str(tmp_path / 'lsh_ckpt')
    plain = dedup.minhash_lsh_pairs(docs, 'doc_id', 'text',
                                    threshold=0.6, k=3).to_pandas()
    r1 = dedup.minhash_lsh_pairs(docs, 'doc_id', 'text', threshold=0.6,
                                 k=3, checkpoint_dir=ckpt).to_pandas()
    m = mf.load_manifest(ckpt, 'lsh_pairs')
    assert m and m['completed'] and m['num_rows'] == len(plain) > 0

    monkeypatch.setattr(dedup, '_minhash_lsh_pairs_impl',
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError('LSH re-ran despite checkpoint')))
    r2 = dedup.minhash_lsh_pairs(docs, 'doc_id', 'text', threshold=0.6,
                                 k=3, checkpoint_dir=ckpt).to_pandas()
    monkeypatch.undo()

    def key_set(df):
        if 'l_id' not in df.columns:  # empty result loses its schema
            return set()
        return set(zip(df['l_id'], df['r_id']))
    assert key_set(plain) == key_set(r1) == key_set(r2)

    # parameter change invalidates the fingerprint
    r3 = dedup.minhash_lsh_pairs(docs, 'doc_id', 'text', threshold=0.99,
                                 k=3, checkpoint_dir=ckpt).to_pandas()
    assert key_set(r3) <= key_set(r1)


def test_edit_distance_join_checkpoint_resume(person_tables, tmp_path,
                                              monkeypatch):
    from py_stringsimjoin_ray import edit_distance_join
    A, B = person_tables
    ckpt = str(tmp_path / 'ed_ckpt')
    args = (A, B, 'A.ID', 'B.ID', 'A.name', 'B.name', 3)
    plain = edit_distance_join(*args)
    r1 = edit_distance_join(*args, checkpoint_dir=ckpt)
    assert mf.load_manifest(ckpt, 'pairs')['num_rows'] == len(plain)

    import py_stringsimjoin_ray.pipelines.join as J

    def boom(*a, **k):  # pragma: no cover
        raise AssertionError('pipeline re-ran despite completed checkpoint')
    monkeypatch.setattr(J, 'match_pairs_dataset', boom)
    r2 = edit_distance_join(*args, checkpoint_dir=ckpt)
    monkeypatch.undo()

    def key_set(df):
        return set(zip(df['l_A.ID'], df['r_B.ID']))
    assert key_set(plain) == key_set(r1) == key_set(r2)
    # integer-score dtype parity survives the parquet round trip
    assert r2['_sim_score'].dtype == plain['_sim_score'].dtype


def test_apply_matcher_checkpoint_resume(person_tables, tmp_path,
                                         monkeypatch):
    """VERDICT r3 #9: apply_matcher's scored stream checkpoints and a
    matching fingerprint skips the scoring pass on re-run."""
    from py_stringsimjoin_ray import OverlapFilter, apply_matcher
    from py_stringsimjoin_ray.core import measures
    A, B = person_tables
    tok = WhitespaceTokenizer(return_set=True)
    cand = OverlapFilter(tok, 1).filter_tables(A, B, 'A.ID', 'B.ID',
                                               'A.name', 'B.name')
    ckpt = str(tmp_path / 'matcher_ckpt')
    args = (cand, 'l_A.ID', 'r_B.ID', A, B, 'A.ID', 'B.ID', 'A.name',
            'B.name', tok, measures.jaccard, 0.3)
    plain = apply_matcher(*args)
    r1 = apply_matcher(*args, checkpoint_dir=ckpt)
    m = mf.load_manifest(ckpt, 'matches')
    assert m and m['completed'] and m['num_rows'] == len(plain)

    # resume must NOT re-score: poison the scoring kernel
    import py_stringsimjoin_ray.pipelines.matcher as M

    def boom(*a, **k):  # pragma: no cover
        raise AssertionError('matcher re-scored despite checkpoint')
    monkeypatch.setattr(M, '_score_mask', boom)
    r2 = apply_matcher(*args, checkpoint_dir=ckpt)
    monkeypatch.undo()

    def key_set(df):
        return set(zip(df['l_A.ID'], df['r_B.ID']))
    assert key_set(plain) == key_set(r1) == key_set(r2)

    # threshold change invalidates the fingerprint
    r3 = apply_matcher(*args[:-1], 0.9, checkpoint_dir=ckpt)
    assert len(r3) <= len(r1)
    assert mf.load_manifest(ckpt, 'matches')['num_rows'] == len(r3)


def test_filter_candset_checkpoint_resume(person_tables, tmp_path,
                                          monkeypatch):
    """VERDICT r3 #9: Filter.filter_candset checkpoints its filtered
    stream (the composable pipeline's intermediate candset)."""
    from py_stringsimjoin_ray import OverlapFilter, SizeFilter
    A, B = person_tables
    tok = WhitespaceTokenizer(return_set=True)
    cand = OverlapFilter(tok, 1).filter_tables(A, B, 'A.ID', 'B.ID',
                                               'A.name', 'B.name')
    f = SizeFilter(tok, 'JACCARD', 0.3)
    ckpt = str(tmp_path / 'candset_ckpt')
    args = (cand, 'l_A.ID', 'r_B.ID', A, B, 'A.ID', 'B.ID', 'A.name',
            'B.name')
    plain = f.filter_candset(*args)
    r1 = f.filter_candset(*args, checkpoint_dir=ckpt)
    m = mf.load_manifest(ckpt, 'candset')
    assert m and m['completed'] and m['num_rows'] == len(plain)

    def boom(self, *a, **k):  # pragma: no cover
        raise AssertionError('filter re-ran despite checkpoint')
    monkeypatch.setattr(SizeFilter, 'filter_pair', boom)
    r2 = f.filter_candset(*args, checkpoint_dir=ckpt)
    monkeypatch.undo()

    def key_set(df):
        return set(zip(df['l_A.ID'], df['r_B.ID']))
    assert key_set(plain) == key_set(r1) == key_set(r2)
    # pandas parity: original index and row order survive the resume
    pd.testing.assert_frame_equal(r2, plain)

    # Dataset candset path checkpoints too
    ckpt2 = str(tmp_path / 'candset_ckpt_ds')
    ds_out = f.filter_candset(ray.data.from_pandas(cand), *args[1:],
                              checkpoint_dir=ckpt2)
    assert isinstance(ds_out, ray.data.Dataset)
    assert key_set(ds_out.to_pandas()) == key_set(plain)


def test_fingerprint_content_sensitivity(person_tables, tmp_path):
    """ADVICE r3: equal-cardinality content changes must invalidate the
    default checkpoint fingerprint (row counts alone alias them)."""
    from py_stringsimjoin_ray.pipelines.join import (_join_fingerprint,
                                                     content_signature)
    A, B = person_tables
    tok = WhitespaceTokenizer(return_set=True)
    fp1 = _join_fingerprint('JACCARD', tok, 0.3, '>=', True, False, A, B,
                            'A.ID', 'B.ID', 'A.name', 'B.name')
    A2 = A.copy()
    A2.loc[A2.index[0], 'A.name'] = 'a completely different name'
    fp2 = _join_fingerprint('JACCARD', tok, 0.3, '>=', True, False, A2, B,
                            'A.ID', 'B.ID', 'A.name', 'B.name')
    assert len(A) == len(A2) and fp1 != fp2
    # same content, row order shuffled: signature is order-independent
    A3 = A.sample(frac=1.0, random_state=7)
    assert content_signature(A, ['A.ID', 'A.name']) == \
        content_signature(A3, ['A.ID', 'A.name'])
    # Dataset inputs: content change inside the sample window invalidates
    import ray.data as rd
    s1 = content_signature(rd.from_pandas(A), ['A.ID', 'A.name'])
    s2 = content_signature(rd.from_pandas(A2), ['A.ID', 'A.name'])
    assert s1 != s2


def test_join_dense_id_dataset_mode(person_tables):
    """VERDICT r3 #8: opt-in dense _id for output='dataset' — ids are
    0..N-1 with no gaps and rows match the pandas assembler."""
    from py_stringsimjoin_ray import jaccard_join
    A, B = person_tables
    tok = WhitespaceTokenizer(return_set=True)
    args = (A, B, 'A.ID', 'B.ID', 'A.name', 'B.name', tok, 0.3)
    ds = jaccard_join(*args, output='dataset', dense_id=True)
    got = ds.to_pandas()
    assert list(got.columns)[0] == '_id'
    assert sorted(got['_id']) == list(range(len(got)))
    plain = jaccard_join(*args)
    assert set(zip(got['l_key'], got['r_key'])) == \
        set(zip(plain['l_A.ID'], plain['r_B.ID']))
    # default stays id-free (documented web-scale non-goal)
    ds2 = jaccard_join(*args, output='dataset')
    assert '_id' not in ds2.to_pandas().columns
