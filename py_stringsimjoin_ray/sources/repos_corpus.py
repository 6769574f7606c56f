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

Generation is vectorized (numpy string assembly, batched rng draws) and
chunk-parallel over Ray tasks when a Ray session is live — a ~million-file
corpus generates in well under a minute instead of tens of minutes of
per-token Python.
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

_PARTS_ARR = np.array(_IDENT_PARTS)
_KW_ARR = np.array(_KEYWORDS)


def _ident_array(rng, size: int, vocab_scale: int) -> np.ndarray:
    """Vectorized identifier minting; suffixed identifiers give Heaps'-law
    vocabulary growth (real corpora mint new names as they grow — without
    it every 'rare' token's df scales with the corpus)."""
    p1 = _PARTS_ARR[rng.integers(0, len(_PARTS_ARR), size)]
    p2 = _PARTS_ARR[rng.integers(0, len(_PARTS_ARR), size)]
    two = rng.random(size) < 0.6
    ident = np.where(two, np.char.add(np.char.add(p1, '_'), p2), p1)
    if vocab_scale:
        suff = rng.random(size) < 0.5
        nums = rng.integers(0, vocab_scale, size).astype('U')
        ident = np.where(suff, np.char.add(np.char.add(ident, '_'), nums),
                         ident)
    return ident


def _content_tokens(rng, n: int, vocab_scale: int) -> np.ndarray:
    r = rng.random(n)
    kws = _KW_ARR[rng.integers(0, len(_KW_ARR), n)]
    idents = _ident_array(rng, n, vocab_scale)
    nums = rng.integers(0, 1000, n).astype('U')
    return np.where(r < 0.25, kws, np.where(r < 0.9, idents, nums))


def _mutate(rng, tokens: np.ndarray, target_jaccard: float,
            vocab_scale: int) -> np.ndarray:
    """Token-level edits: replace/delete/insert ~(1-j)/(1+j)·n tokens so the
    resulting token-set Jaccard lands near the target."""
    n = max(len(tokens), 1)
    k = int(round(n * (1 - target_jaccard) / (1 + target_jaccard))) + \
        (1 if target_jaccard < 1 else 0)
    out = list(tokens)
    repl = _ident_array(rng, k, vocab_scale)
    ops = rng.random(k)
    for j in range(k):
        pos = int(rng.integers(0, len(out))) if out else 0
        if ops[j] < 0.5 and out:
            out[pos] = repl[j]
        elif ops[j] < 0.8 and out:
            del out[pos]
        else:
            out.insert(pos, repl[j])
    return np.asarray(out, dtype=tokens.dtype if len(tokens) else 'U32')


def _set_jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    o = len(a & b)
    return o / (len(a) + len(b) - o)


def _generate_chunk(chunk_seed: int, chunk_tag: int, n_clusters: int,
                    n_singletons: int, max_cluster: int,
                    tokens_per_file: int, vocab_scale: int,
                    license_fraction: float, boilerplate_fraction: float,
                    cid_base: int):
    """One deterministic generation chunk → (rows dict, truth dict)."""
    rng = np.random.default_rng(chunk_seed)
    rows = {k: [] for k in ('repo', 'path', 'commit', 'lang', 'content')}
    truth = {'repo': [], 'path': [], 'commit': [], 'cluster_id': [],
             'sha256': []}

    def add_file(cluster_id: int, content: str):
        i = len(rows['repo'])
        tag = f'{chunk_tag}_{i}'
        repo = f'org{(chunk_tag * 131 + i) % 37}/project{(chunk_tag * 17 + i) % 101}'
        lang = LANGS[int(rng.integers(0, len(LANGS)))]
        path = f'src/m{chunk_tag}/{_PARTS_ARR[int(rng.integers(0, len(_PARTS_ARR)))]}_{tag}.{lang}'
        commit = hashlib.sha1(f'{chunk_seed}:{tag}'.encode()).hexdigest()[:12]
        rows['repo'].append(repo)
        rows['path'].append(path)
        rows['commit'].append(commit)
        rows['lang'].append(lang)
        rows['content'].append(content)
        truth['repo'].append(repo)
        truth['path'].append(path)
        truth['commit'].append(commit)
        truth['cluster_id'].append(cluster_id)
        truth['sha256'].append(hashlib.sha256(content.encode()).hexdigest())

    def decorate(tokens, use_license: bool, use_boiler: bool) -> str:
        parts = []
        if use_license:
            parts.append(LICENSE_HEADER)
        if use_boiler:
            parts.append(BOILERPLATE)
        parts.append(' '.join(tokens))
        return ' '.join(parts)

    cid = cid_base
    for _ in range(n_clusters):
        size = int(rng.integers(2, max_cluster + 1))
        # decoration is decided per cluster (clone families share headers),
        # which keeps the hot license/boilerplate tokens AND keeps planted
        # pairs above the blocking threshold
        use_lic = rng.random() < license_fraction
        use_boil = rng.random() < boilerplate_fraction
        base = _content_tokens(rng, tokens_per_file, vocab_scale)
        base_doc = decorate(base, use_lic, use_boil)
        base_set = set(base_doc.split())
        add_file(cid, base_doc)
        for _ in range(size - 1):
            level = float(rng.choice([0.95, 0.9, 0.85]))
            doc = None
            for _attempt in range(6):
                cand = decorate(_mutate(rng, base, level, vocab_scale),
                                use_lic, use_boil)
                if _set_jaccard(set(cand.split()), base_set) >= 0.8:
                    doc = cand
                    break
                level = min(1.0, level + 0.03)  # retry with lighter edits
            add_file(cid, doc if doc is not None else base_doc)
        cid += 1
    for _ in range(n_singletons):
        add_file(cid, decorate(
            _content_tokens(rng, tokens_per_file, vocab_scale),
            rng.random() < license_fraction,
            rng.random() < boilerplate_fraction))
        cid += 1
    return rows, truth


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

    # vocabulary grows with expected corpus size (see _ident_array)
    vocab_scale = max(1000, (num_clusters * (2 + max_cluster) // 2
                             + num_singletons) * 4)
    nchunks = max(1, min(64, num_clusters // 64 or 1))
    seeds = np.random.SeedSequence(seed).generate_state(nchunks * 2)
    per_cl = [num_clusters // nchunks + (1 if i < num_clusters % nchunks
                                         else 0) for i in range(nchunks)]
    per_sg = [num_singletons // nchunks + (1 if i < num_singletons % nchunks
                                           else 0) for i in range(nchunks)]
    # cluster-id bases so truth ids stay globally unique
    cid_bases, acc = [], 0
    for i in range(nchunks):
        cid_bases.append(acc)
        acc += per_cl[i] + per_sg[i]

    args = [(int(seeds[i]), i, per_cl[i], per_sg[i], max_cluster,
             tokens_per_file, vocab_scale, license_fraction,
             boilerplate_fraction, cid_bases[i]) for i in range(nchunks)]

    use_ray = False
    try:
        import ray
        use_ray = ray.is_initialized() and nchunks > 1
    except Exception:  # pragma: no cover
        pass
    if use_ray:
        import ray
        gen = ray.remote(_generate_chunk)
        parts = ray.get([gen.remote(*a) for a in args])
    else:
        parts = [_generate_chunk(*a) for a in args]

    rows = {k: [] for k in ('repo', 'path', 'commit', 'lang', 'content')}
    truth = {'repo': [], 'path': [], 'commit': [], 'cluster_id': [],
             'sha256': []}
    for r, t in parts:
        for k in rows:
            rows[k].extend(r[k])
        for k in truth:
            truth[k].extend(t[k])

    # edge cases: empty and single-token files (each its own cluster)
    edge_rng = np.random.default_rng(seed + 1)
    cid = acc
    for content in ['', ' ', 'solitarytokenxyz']:
        i = len(rows['repo'])
        repo, path = 'org0/edge', f'src/edge/e_{i}.py'
        commit = hashlib.sha1(f'{seed}:edge:{i}'.encode()).hexdigest()[:12]
        rows['repo'].append(repo)
        rows['path'].append(path)
        rows['commit'].append(commit)
        rows['lang'].append('py')
        rows['content'].append(content)
        truth['repo'].append(repo)
        truth['path'].append(path)
        truth['commit'].append(commit)
        truth['cluster_id'].append(cid)
        truth['sha256'].append(hashlib.sha256(content.encode()).hexdigest())
        cid += 1
    del edge_rng

    # multi-file directory + small row groups: ray.data parallelizes the
    # read per FILE first, so a single big file floor-bounds ingest at any
    # CPU count (measured ~8 s flat at both 8 and 32 CPUs on 1.5M rows);
    # file names are zero-padded so name order == row order (determinism)
    tbl = pa.table({k: pa.array(v) for k, v in rows.items()})
    if os.path.isfile(repos_path):
        os.remove(repos_path)
    os.makedirs(repos_path, exist_ok=True)
    nfiles = max(1, min(64, len(tbl) // 16384))
    step = (len(tbl) + nfiles - 1) // nfiles
    for i in range(nfiles):
        pq.write_table(tbl.slice(i * step, step),
                       os.path.join(repos_path, f'part-{i:04d}.parquet'),
                       row_group_size=2048)
    pq.write_table(pa.table({k: pa.array(v) for k, v in truth.items()}),
                   truth_path, row_group_size=4096)
    return repos_path, truth_path
