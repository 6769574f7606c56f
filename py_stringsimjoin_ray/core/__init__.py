from . import bounds, comp_ops, measures, ordering, tokenizers, validation  # noqa: F401
