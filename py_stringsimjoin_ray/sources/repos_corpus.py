"""Deterministic synthetic source-code-repository corpus (FIXTURES.md F3).

Input shape per BASELINE.json's input_hint:
``(repo:string, path:string, commit:string, lang:string, content:string)``.

Planted structure:
- K duplicate-clusters of sizes 1..max_cluster, built by token-level
  mutations of a base file at controlled Jaccard levels (~0.95/0.9/0.8),
  plus unrelated singletons;
- a shared license header prepended to a large fraction of files and a
  boilerplate block shared across clusters → hot blocking tokens (the
  skew case the north star names);
- empty files and single-token files (allow_empty edge paths).

Ground truth (cluster id) and per-row sha256 are emitted to a SEPARATE
truth parquet so the corpus table keeps exactly the input_hint schema.
All generation is seeded — same args, same bytes.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LICENSE_HEADER = ('// Copyright 2024 The Example Authors. Licensed under '
                  'the Apache License Version 2.0 you may not use this file '
                  'except in compliance with the License')
BOILERPLATE = ('import os import sys from typing import Any def main argv '
               'return 0 if name main')

LANGS = ['py', 'js', 'java', 'c', 'go', 'rs']

_IDENT_PARTS = ['get', 'set', 'load', 'parse', 'build', 'run', 'init',
                'handle', 'read', 'write', 'merge', 'split', 'hash', 'index',
                'token', 'batch', 'node', 'edge', 'graph', 'table', 'row',
                'col', 'key', 'value', 'buf', 'ctx', 'cfg', 'util', 'data',
                'stream', 'block', 'shard', 'queue', 'pool', 'task', 'job']
_KEYWORDS = ['def', 'class', 'return', 'if', 'else', 'for', 'while', 'try',
             'import', 'from', 'with', 'lambda', 'yield', 'assert', 'raise']


def _rand_ident(rng, vocab_scale: int = 0) -> str:
    n = rng.integers(1, 4)
    ident = '_'.join(rng.choice(_IDENT_PARTS) for _ in range(n))
    # Heaps'-law vocabulary growth: real code corpora mint new identifiers
    # (unique names, hashes, counters) as they grow — without this the pool
    # saturates and every "rare" token's document frequency scales with the
    # corpus, which no blocking scheme survives (and no real corpus shows).
    if vocab_scale and rng.random() < 0.5:
        ident = f'{ident}_{rng.integers(0, vocab_scale)}'
    return ident


def _base_content(rng, n_tokens: int, vocab_scale: int = 0) -> list[str]:
    toks = []
    while len(toks) < n_tokens:
        r = rng.random()
        if r < 0.25:
            toks.append(str(rng.choice(_KEYWORDS)))
        elif r < 0.9:
            toks.append(_rand_ident(rng, vocab_scale))
        else:
            toks.append(str(rng.integers(0, 1000)))
    return toks


def _mutate(rng, tokens: list[str], target_jaccard: float,
            vocab_scale: int = 0) -> list[str]:
    """Token-level edits: replace ~(1-j)/(1+j)·n tokens so the resulting
    token-set Jaccard lands near the target."""
    n = max(len(tokens), 1)
    k = int(round(n * (1 - target_jaccard) / (1 + target_jaccard))) + \
        (1 if target_jaccard < 1 else 0)
    out = list(tokens)
    for _ in range(k):
        op = rng.random()
        pos = int(rng.integers(0, len(out))) if out else 0
        if op < 0.5 and out:
            out[pos] = _rand_ident(rng, vocab_scale)
        elif op < 0.8 and out:
            del out[pos]
        else:
            out.insert(pos, _rand_ident(rng, vocab_scale))
    return out


def generate_repos_corpus(out_dir: str, num_clusters: int = 120,
                          max_cluster: int = 5, num_singletons: int = 150,
                          tokens_per_file: int = 120, seed: int = 42,
                          license_fraction: float = 0.6,
                          boilerplate_fraction: float = 0.3,
                          overwrite: bool = False):
    """Write ``repos.parquet`` + ``truth.parquet`` under out_dir; returns
    (repos_path, truth_path).  Deterministic for fixed arguments."""
    os.makedirs(out_dir, exist_ok=True)
    repos_path = os.path.join(out_dir, 'repos.parquet')
    truth_path = os.path.join(out_dir, 'truth.parquet')
    if not overwrite and os.path.exists(repos_path) and os.path.exists(truth_path):
        return repos_path, truth_path

    rng = np.random.default_rng(seed)
    # vocabulary grows with expected corpus size (see _rand_ident)
    vocab_scale = max(1000, (num_clusters * (2 + max_cluster) // 2
                             + num_singletons) * 4)
    rows = {k: [] for k in ('repo', 'path', 'commit', 'lang', 'content')}
    truth = {'repo': [], 'path': [], 'commit': [], 'cluster_id': [],
             'sha256': []}

    def add_file(cluster_id: int, content: str):
        i = len(rows['repo'])
        repo = f'org{i % 37}/project{i % 101}'
        path = f'src/{_rand_ident(rng)}/{_rand_ident(rng)}_{i}.{rng.choice(LANGS)}'
        commit = hashlib.sha1(f'{seed}:{i}'.encode()).hexdigest()[:12]
        rows['repo'].append(repo)
        rows['path'].append(path)
        rows['commit'].append(commit)
        rows['lang'].append(path.rsplit('.', 1)[-1])
        rows['content'].append(content)
        truth['repo'].append(repo)
        truth['path'].append(path)
        truth['commit'].append(commit)
        truth['cluster_id'].append(cluster_id)
        truth['sha256'].append(hashlib.sha256(content.encode()).hexdigest())

    def decorate(tokens: list[str], use_license: bool, use_boiler: bool) -> str:
        parts = []
        if use_license:
            parts.append(LICENSE_HEADER)
        if use_boiler:
            parts.append(BOILERPLATE)
        parts.append(' '.join(tokens))
        return ' '.join(parts)

    def set_jaccard(a: str, b: str) -> float:
        sa, sb = set(a.split()), set(b.split())
        if not sa and not sb:
            return 1.0
        o = len(sa & sb)
        return o / (len(sa) + len(sb) - o)

    cid = 0
    for _ in range(num_clusters):
        size = int(rng.integers(2, max_cluster + 1))
        # decoration is decided per cluster (clone families share headers),
        # which keeps the hot license/boilerplate tokens AND keeps planted
        # pairs above the blocking threshold
        use_lic = rng.random() < license_fraction
        use_boil = rng.random() < boilerplate_fraction
        base = _base_content(rng, tokens_per_file, vocab_scale)
        base_doc = decorate(base, use_lic, use_boil)
        add_file(cid, base_doc)
        for _ in range(size - 1):
            level = float(rng.choice([0.95, 0.9, 0.85]))
            doc = None
            for _attempt in range(6):
                cand = decorate(_mutate(rng, base, level, vocab_scale),
                                use_lic, use_boil)
                if set_jaccard(cand, base_doc) >= 0.8:
                    doc = cand
                    break
                level = min(1.0, level + 0.03)  # retry with lighter edits
            add_file(cid, doc if doc is not None else base_doc)
        cid += 1
    for _ in range(num_singletons):
        add_file(cid, decorate(_base_content(rng, tokens_per_file, vocab_scale),
                               rng.random() < license_fraction,
                               rng.random() < boilerplate_fraction))
        cid += 1
    # edge cases: empty and single-token files (each its own cluster)
    for content in ['', ' ', 'solitarytokenxyz']:
        add_file(cid, content)
        cid += 1

    # small row groups so ray.data.read_parquet can split the read across
    # tasks (a single row group serializes the whole ingest)
    pq.write_table(pa.table({k: pa.array(v) for k, v in rows.items()}),
                   repos_path, row_group_size=2048)
    pq.write_table(pa.table({k: pa.array(v) for k, v in truth.items()}),
                   truth_path, row_group_size=4096)
    return repos_path, truth_path
