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
