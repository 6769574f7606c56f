import copyreg  # noqa: F401  (re-export: `from six.moves import copyreg`)

xrange = range
