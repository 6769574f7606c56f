def remove_non_ascii(s: str) -> str:
    """Strip non-ASCII characters (reference:
    /root/reference/py_stringsimjoin/utils/generic_helper.py:111-112)."""
    return ''.join(c for c in s if ord(c) < 128)
