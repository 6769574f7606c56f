"""Per-stage lineage manifests + resume (north-rule requirement: the job
resumes from the last completed checkpoint; every stage writes partitioned
Parquet plus a manifest with input fingerprint, row counts and a
content-hash roll-up).

Layout under a checkpoint dir:

    <ckpt>/<stage>/part-*.parquet     (written atomically: tmp dir + rename)
    <ckpt>/<stage>/_manifest.json     {stage, input_fingerprint, num_rows,
                                       counters, sha256_xor?, completed}

A stage is skipped on re-run iff its manifest exists, is marked completed
and its input fingerprint matches — the fingerprint chains stages together,
so editing an upstream artifact invalidates everything downstream.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import numpy as np
import pyarrow as pa

import ray.data

MANIFEST = '_manifest.json'


def stage_dir(ckpt_dir: str, stage: str) -> str:
    return os.path.join(ckpt_dir, stage)


def load_manifest(ckpt_dir: str, stage: str):
    p = os.path.join(stage_dir(ckpt_dir, stage), MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def is_complete(ckpt_dir: str | None, stage: str, input_fingerprint: str) -> bool:
    if ckpt_dir is None:
        return False
    m = load_manifest(ckpt_dir, stage)
    return bool(m and m.get('completed')
                and m.get('input_fingerprint') == input_fingerprint)


def sha256_xor_rollup(ds: ray.data.Dataset, col: str = 'sha256') -> str:
    """Order-independent roll-up of a hex-digest column: XOR of the first 16
    hex chars (64 bits) of every row digest, carried as two 32-bit halves."""
    def part(batch: pa.Table) -> pa.Table:
        # vectorized hex parse: first 16 hex chars per row → uint64, then a
        # single XOR reduction (no per-row Python)
        import pyarrow.compute as pc
        col16 = pc.utf8_slice_codeunits(
            batch[col].combine_chunks(), 0, 16)
        joined = ''.join(col16.to_pylist())
        if joined:
            b = np.frombuffer(joined.encode('ascii'), dtype=np.uint8)
            nib = np.where(b >= ord('a'), b - ord('a') + 10, b - ord('0')) \
                .astype(np.uint64)
            nib = nib.reshape(-1, 16)
            shifts = np.uint64(4) * np.arange(15, -1, -1, dtype=np.uint64)
            vals = (nib << shifts).sum(axis=1, dtype=np.uint64)
            acc = int(np.bitwise_xor.reduce(vals))
        else:
            acc = 0
        return pa.table({'lo': pa.array([acc & 0xFFFFFFFF], pa.int64()),
                         'hi': pa.array([acc >> 32], pa.int64())})
    parts = ds.map_batches(part, batch_format='pyarrow').to_pandas()
    acc = 0
    for lo, hi in zip(parts['lo'], parts['hi']):
        acc ^= (int(hi) << 32) | int(lo)
    return format(acc, '016x')


def write_stage(ds: ray.data.Dataset, ckpt_dir: str, stage: str,
                input_fingerprint: str, counters: dict | None = None,
                sha_col: str | None = None) -> ray.data.Dataset:
    """Write a stage Dataset to partitioned Parquet atomically (tmp dir +
    rename) with its manifest; returns a Dataset reading the artifact."""
    final = stage_dir(ckpt_dir, stage)
    tmp = final + '.tmp-' + uuid.uuid4().hex[:8]
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    ds.write_parquet(tmp)
    back = ray.data.read_parquet(tmp)
    num_rows = back.count()
    manifest = {
        'stage': stage,
        'input_fingerprint': input_fingerprint,
        'num_rows': int(num_rows),
        'num_files': len([f for f in os.listdir(tmp) if f.endswith('.parquet')]),
        'counters': counters or {},
        'completed': True,
    }
    if sha_col is not None:
        manifest['sha256_xor'] = sha256_xor_rollup(back, sha_col)
    with open(os.path.join(tmp, MANIFEST), 'w') as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.replace(tmp, final)
    return ray.data.read_parquet(final)


def update_manifest_counters(ckpt_dir: str, stage: str,
                             extra: dict) -> None:
    """Merge ``extra`` into a completed stage manifest's ``counters`` —
    used for telemetry gathered only after the stage wrote (e.g. the
    per-task skew roll-up, VERDICT r4 #7)."""
    p = os.path.join(stage_dir(ckpt_dir, stage), MANIFEST)
    if not os.path.exists(p):
        return
    with open(p) as f:
        m = json.load(f)
    m.setdefault('counters', {}).update(extra)
    tmp = p + '.tmp'
    with open(tmp, 'w') as f:
        json.dump(m, f, indent=1, sort_keys=True)
    os.replace(tmp, p)


def read_stage(ckpt_dir: str, stage: str) -> ray.data.Dataset:
    return ray.data.read_parquet(stage_dir(ckpt_dir, stage))


def file_fingerprint(path: str) -> str:
    """Cheap input fingerprint: path + size + mtime-ns of each file."""
    entries = []
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if name.endswith('.parquet'):
                st = os.stat(os.path.join(path, name))
                entries.append((name, st.st_size, st.st_mtime_ns))
    else:
        st = os.stat(path)
        entries.append((os.path.basename(path), st.st_size, st.st_mtime_ns))
    import hashlib
    return hashlib.md5(json.dumps(entries).encode()).hexdigest()
