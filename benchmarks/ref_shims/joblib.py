"""Minimal stand-in for `joblib.Parallel` / `joblib.delayed` (benchmark-
support shim — see six/__init__.py).  The reference's parallel joins call
``Parallel(n_jobs=n)(delayed(f)(args...) ...)`` with module-level picklable
functions; a multiprocessing pool reproduces joblib's process-based
execution model, so its measured n_jobs speedup is the reference's own."""

from __future__ import annotations

import multiprocessing as mp


def delayed(func):
    def wrapper(*args, **kwargs):
        return (func, args, kwargs)
    return wrapper


class Parallel:
    def __init__(self, n_jobs=1, **kwargs):
        self.n_jobs = n_jobs

    def __call__(self, tasks):
        tasks = list(tasks)
        n = self.n_jobs if self.n_jobs and self.n_jobs > 0 else mp.cpu_count()
        if n <= 1 or len(tasks) <= 1:
            return [f(*a, **k) for f, a, k in tasks]
        ctx = mp.get_context('fork')
        with ctx.Pool(min(n, len(tasks))) as pool:
            handles = [pool.apply_async(f, a, k) for f, a, k in tasks]
            return [h.get() for h in handles]
