def remove_non_ascii(s: str) -> str:
    """Strip non-ASCII characters (reference:
    /root/reference/py_stringsimjoin/utils/generic_helper.py:111-112)."""
    return ''.join(c for c in s if ord(c) < 128)


def get_install_path() -> str:
    """Directory containing the installed package — reference surface
    parity (``utils/generic_helper.py:124-126``)."""
    import os
    current_dir = os.path.dirname(os.path.realpath(__file__))
    return os.path.dirname(os.path.dirname(current_dir))
