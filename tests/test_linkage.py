"""End-to-end north-star pipeline tests: F1 vs planted truth, sha256
invariant, checkpoint/resume."""

import json
import os

import pandas as pd
import pytest

from py_stringsimjoin_ray.pipelines.linkage import pairwise_f1, record_linkage
from py_stringsimjoin_ray.sources.repos_corpus import generate_repos_corpus
from py_stringsimjoin_ray.state import manifests as mf


@pytest.fixture(scope='module')
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp('repos_corpus')
    repos, truth = generate_repos_corpus(str(d), num_clusters=40,
                                         max_cluster=4, num_singletons=60,
                                         tokens_per_file=80, seed=7)
    return repos, truth


def test_generator_deterministic(tmp_path):
    p1, t1 = generate_repos_corpus(str(tmp_path / 'a'), num_clusters=5,
                                   num_singletons=5, seed=3)
    p2, t2 = generate_repos_corpus(str(tmp_path / 'b'), num_clusters=5,
                                   num_singletons=5, seed=3)
    a = pd.read_parquet(p1)
    b = pd.read_parquet(p2)
    pd.testing.assert_frame_equal(a, b)
    ta = pd.read_parquet(t1)
    assert set(ta.columns) == {'repo', 'path', 'commit', 'cluster_id',
                               'sha256'}
    # planted sha matches content
    import hashlib
    assert ta['sha256'][0] == hashlib.sha256(
        a['content'][0].encode()).hexdigest()


def test_linkage_f1_and_invariant(corpus, tmp_path):
    repos, truth = corpus
    ckpt = str(tmp_path / 'ckpt')
    res = record_linkage(repos, checkpoint_dir=ckpt, threshold=0.7)
    assert res['counters']['sha256_invariant_ok']
    clusters = res['clusters'].to_pandas()
    truth_pd = pd.read_parquet(truth)
    assert len(clusters) == len(truth_pd)
    scores = pairwise_f1(clusters, truth_pd)
    assert scores['f1'] >= 0.99, scores
    # manifests exist for every stage
    for stage in ('ingest', 'matches', 'clusters'):
        m = mf.load_manifest(ckpt, stage)
        assert m and m['completed'] and m['num_rows'] > 0


def test_linkage_resume_skips_completed_stages(corpus, tmp_path):
    repos, truth = corpus
    ckpt = str(tmp_path / 'ckpt2')
    r1 = record_linkage(repos, checkpoint_dir=ckpt, threshold=0.7)
    r2 = record_linkage(repos, checkpoint_dir=ckpt, threshold=0.7)
    assert r2['counters'].get('ingest_resumed')
    assert r2['counters'].get('matches_resumed')
    assert r2['counters'].get('clusters_resumed')
    assert r1['counters']['num_matches'] == r2['counters']['num_matches']


def test_linkage_resume_after_partial_failure(corpus, tmp_path):
    """Simulate a crash after the matches stage: delete the clusters
    artifact; the re-run must reuse ingest+matches and rebuild clusters."""
    import shutil
    repos, truth = corpus
    ckpt = str(tmp_path / 'ckpt3')
    record_linkage(repos, checkpoint_dir=ckpt, threshold=0.7)
    shutil.rmtree(os.path.join(ckpt, 'clusters'))
    r = record_linkage(repos, checkpoint_dir=ckpt, threshold=0.7)
    assert r['counters'].get('matches_resumed')
    assert not r['counters'].get('clusters_resumed')
    assert r['counters']['sha256_invariant_ok']


def test_linkage_no_checkpoint(corpus):
    repos, truth = corpus
    res = record_linkage(repos, threshold=0.7)
    assert res['counters']['sha256_invariant_ok']
    assert res['counters']['num_records'] == len(pd.read_parquet(truth))


def test_linkage_forced_star_rounds_equality(corpus):
    """SSJ_CC_TASK_GATE=0 forces the clusters stage through the distributed
    large/small-star rounds instead of the single-task min-label kernel;
    the component assignment must be identical (VERDICT r2 #9).  The
    planted corpus is skewed by construction (clusters up to 4 files plus
    singletons sharing boilerplate tokens)."""
    repos, truth = corpus
    base = record_linkage(repos, threshold=0.7)['clusters'].to_pandas()
    os.environ['SSJ_CC_TASK_GATE'] = '0'
    try:
        forced = record_linkage(repos, threshold=0.7)['clusters'].to_pandas()
    finally:
        del os.environ['SSJ_CC_TASK_GATE']
    key = ['repo', 'path', 'commit']
    a = base.sort_values(key).reset_index(drop=True)
    b = forced.sort_values(key).reset_index(drop=True)
    # component LABELS may differ between algorithms; the PARTITION may not
    amap = a.groupby('component').ngroup()
    bmap = b.groupby('component').ngroup()
    assert (amap == bmap).all()
    pd.testing.assert_frame_equal(a.drop(columns=['component']),
                                  b.drop(columns=['component']))


def test_ingest_hashing_pinned():
    """The Arrow-kernel key build emits byte-identical record_ids and
    sha256 to the per-row f-string implementation it replaced."""
    import hashlib

    import pyarrow as pa

    from py_stringsimjoin_ray.pipelines.linkage import _ingest_batch
    rows = [('r/a', 'src/m.py', 'c1', 'print(1)\n'),
            ('r/β', 'päth/ünïcode.py', 'c2', 'héllo wörld'),
            ('r/c', 'x', 'c3', ''),
            ('r/d', 'y', 'c4', None)]
    batch = pa.table({'repo': [r[0] for r in rows],
                      'path': [r[1] for r in rows],
                      'commit': [r[2] for r in rows],
                      'content': pa.array([r[3] for r in rows],
                                          pa.string())})
    out = _ingest_batch(batch)
    for i, (repo, path, commit, content) in enumerate(rows):
        key = f'{repo}\x00{path}\x00{commit}'.encode()
        exp_rid = int.from_bytes(hashlib.sha1(key).digest()[:8],
                                 'little') & 0x7FFFFFFFFFFFFFFF
        exp_sha = hashlib.sha256((content or '').encode()).hexdigest()
        assert out['record_id'][i].as_py() == exp_rid
        assert out['sha256'][i].as_py() == exp_sha


def test_bucketed_attach_preserves_63bit_component_ids(ray_session):
    """Regression: the bucketed (beyond-gate) component attach must not
    round 63-bit ids through float64 (the unioned column carries nulls on
    the ingest side; a whole-column to_numpy converts to float64 and
    corrupts ids above 2^53)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from py_stringsimjoin_ray.pipelines.linkage import _attach_components
    big = (1 << 60) + 1  # survives int64, NOT float64
    ingest = ray.data.from_arrow(pa.table({
        'record_id': pa.array([big, big + 2, 7], pa.int64()),
        'repo': ['r'] * 3, 'path': ['p'] * 3, 'commit': ['c'] * 3,
        'sha256': ['s'] * 3}))
    comp = ray.data.from_arrow(pa.table({
        'node': pa.array([big, big + 2], pa.int64()),
        'component': pa.array([big, big], pa.int64())}))
    out = _attach_components(ingest, comp, broadcast_gate=0).to_pandas()
    got = dict(zip(out['record_id'], out['component']))
    assert got[big] == big and got[big + 2] == big
    assert got[7] == 7  # singleton defaults to itself


def test_skew_counters_in_matches_manifest(corpus, tmp_path, monkeypatch):
    """VERDICT r4 #7: the matches-stage manifest carries per-task
    candgen/verify volume roll-ups (tasks / total / max / skew ratio) so a
    skewed corpus is diagnosable from the checkpoint dir alone.  Forced
    salting (every token heavy) exercises the grid path too."""
    repos, _truth = corpus
    ckpt = str(tmp_path / 'ckpt_skew')
    res = record_linkage(repos, checkpoint_dir=ckpt, threshold=0.7,
                         salt_df_threshold=4)
    m = mf.load_manifest(ckpt, 'matches')
    assert m and m['completed']
    c = m['counters']
    assert c.get('skew_candgen_tasks', 0) >= 1
    assert c.get('skew_verify_tasks', 0) >= 1
    assert c.get('skew_candgen_max_task', 0) >= 1
    assert c.get('skew_verify_max_task', 0) >= 1
    assert c.get('skew_candgen_total', 0) >= c['skew_candgen_max_task']
    assert c['skew_verify_skew_ratio'] >= 1.0
    assert res['counters']['skew']['verify']['total'] \
        == c['skew_verify_total']
