"""Minimal stand-in for the `six` compatibility package — just the three
names the reference engine imports (`iteritems`, `six.moves.xrange`,
`six.moves.copyreg`).  Benchmark-support code only: lets the PUBLIC
reference repo's pure-Python join path run in this container (which has no
six/joblib/pyprind/py_stringmatching) so BASELINE.md can record a measured
reference-vs-ours head-to-head instead of a self-baseline."""


def iteritems(d, **kw):
    return iter(d.items(**kw))


def itervalues(d, **kw):
    return iter(d.values(**kw))


from . import moves  # noqa: E402,F401  (six.moves submodule)
