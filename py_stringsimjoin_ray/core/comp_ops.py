"""Comparison-operator table (mirrors
``/root/reference/py_stringsimjoin/utils/generic_helper.py:10-15``)."""

import operator

COMP_OP_MAP = {
    '>=': operator.ge,
    '>': operator.gt,
    '<=': operator.le,
    '<': operator.lt,
    '=': operator.eq,
    '!=': operator.ne,
}
