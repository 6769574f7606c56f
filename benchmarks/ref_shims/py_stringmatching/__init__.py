"""Minimal stand-in for the `py_stringmatching` package (benchmark-support
shim — see six/__init__.py): only the tokenizer classes and similarity
measures the reference engine imports, implemented from their public
mathematical definitions.  NOT a copy of py_stringmatching code."""
