"""Broadcast helpers: put a small artifact in the object store ONCE and read
it inside every task/actor, instead of re-shipping it per batch (the Ray-Data
equivalent of the reference's copy-L-into-every-worker strategy,
``/root/reference/py_stringsimjoin/join/jaccard_join_py.py:178-195`` — but
paid once per node, not once per worker slice)."""

from __future__ import annotations

import ray


def put(obj):
    return ray.put(obj)


def get(ref):
    if isinstance(ref, ray.ObjectRef):
        return ray.get(ref)
    return ref
