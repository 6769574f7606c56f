"""Input validation with reference-compatible error types/messages.

Mirrors ``/root/reference/py_stringsimjoin/utils/validation.py`` but accepts
``ray.data.Dataset`` as well as ``pandas.DataFrame`` tables.  Checks are
driver-side and cheap (schema-only where possible); the key-uniqueness check
on a Dataset is an aggregate, run only when ``check_key_uniqueness`` is
enabled (the linkage pipeline derives its own dense unique ids instead).
"""

from __future__ import annotations

import pandas as pd

from .comp_ops import COMP_OP_MAP
from .tokenizers import QgramTokenizer, Tokenizer

SIM_MEASURE_TYPES = ['COSINE', 'DICE', 'EDIT_DISTANCE', 'JACCARD', 'OVERLAP']


def _is_dataset(table) -> bool:
    try:
        import ray.data
        return isinstance(table, ray.data.Dataset)
    except ImportError:  # pragma: no cover
        return False


def table_columns(table) -> list[str]:
    if isinstance(table, pd.DataFrame):
        return list(table.columns)
    if _is_dataset(table):
        return table.schema().names
    raise TypeError('unsupported table type: %r' % type(table))


def validate_input_table(table, table_label: str) -> bool:
    if not (isinstance(table, pd.DataFrame) or _is_dataset(table)):
        raise TypeError(table_label + ' is not a dataframe')
    return True


def validate_attr(attr, table_cols, attr_label: str, table_label: str) -> bool:
    if attr not in list(table_cols):
        raise AssertionError("%s '%s' not found in %s" % (attr_label, attr, table_label))
    return True


def validate_attr_type(attr, attr_type, attr_label: str, table_label: str) -> bool:
    """The reference rejects non-object (numeric) join columns."""
    import pyarrow as pa
    ok = attr_type == object or (isinstance(attr_type, pa.DataType)
                                 and (pa.types.is_string(attr_type)
                                      or pa.types.is_large_string(attr_type)))
    if not ok:
        raise AssertionError("%s '%s' in %s is not of string type." %
                             (attr_label, attr, table_label))
    return True


def get_attr_type(table, attr):
    if isinstance(table, pd.DataFrame):
        return table[attr].dtype
    schema = table.schema()  # ray.data Schema wrapper: .names / .types
    return dict(zip(schema.names, schema.types))[attr]


def validate_key_attr(key_attr, table, table_label: str) -> bool:
    if isinstance(table, pd.DataFrame):
        unique_flag = len(table[key_attr].unique()) == len(table)
        nan_flag = sum(pd.isnull(table[key_attr])) == 0
        if not (unique_flag and nan_flag):
            raise AssertionError("'%s' is not a key attribute in %s" %
                                 (key_attr, table_label))
    else:
        import pyarrow.compute as pc  # noqa: F401
        n = table.count()
        distinct = table.select_columns([key_attr]).unique(key_attr)
        if len(distinct) != n or any(v is None for v in distinct):
            raise AssertionError("'%s' is not a key attribute in %s" %
                                 (key_attr, table_label))
    return True


def validate_output_attrs(l_out_attrs, l_columns, r_out_attrs, r_columns) -> bool:
    if l_out_attrs:
        for attr in l_out_attrs:
            if attr not in list(l_columns):
                raise AssertionError("output attribute '%s' not found in left table" % attr)
    if r_out_attrs:
        for attr in r_out_attrs:
            if attr not in list(r_columns):
                raise AssertionError("output attribute '%s' not found in right table" % attr)
    return True


def validate_threshold(threshold, sim_type: str) -> bool:
    if sim_type == 'EDIT_DISTANCE':
        if threshold < 0:
            raise AssertionError('threshold for ' + sim_type +
                                 ' should be greater than or equal to 0')
    elif sim_type == 'OVERLAP':
        if threshold <= 0:
            raise AssertionError('threshold for ' + sim_type +
                                 ' should be greater than 0')
    else:
        if threshold <= 0 or threshold > 1:
            raise AssertionError('threshold for ' + sim_type +
                                 ' should be in (0, 1]')
    return True


def validate_tokenizer(tokenizer) -> bool:
    if not isinstance(tokenizer, Tokenizer):
        raise TypeError('Invalid tokenizer provided as input')
    return True


def validate_tokenizer_for_sim_measure(tokenizer, sim_type: str) -> bool:
    if not isinstance(tokenizer, Tokenizer):
        raise TypeError('Invalid tokenizer provided as input')
    if sim_type == 'EDIT_DISTANCE' and not isinstance(tokenizer, QgramTokenizer):
        raise AssertionError('Invalid tokenizer for EDIT_DISTANCE measure. '
                             'Only qgram tokenizer should be used for EDIT_DISTANCE.')
    return True


def validate_sim_measure_type(sim_type: str) -> bool:
    if sim_type.upper() not in SIM_MEASURE_TYPES:
        raise TypeError("'%s' is not a valid sim_measure_type. Supported types "
                        "are COSINE, DICE, EDIT_DISTANCE, JACCARD and OVERLAP." % sim_type)
    return True


def validate_comp_op_for_sim_measure(comp_op: str, sim_type: str) -> bool:
    if sim_type == 'EDIT_DISTANCE':
        if comp_op not in ['<=', '<', '=']:
            raise AssertionError('Comparison operator not supported. Supported '
                                 'comparison operators for %s are <=, < and =.' % sim_type)
    else:
        if comp_op not in ['>=', '>', '=']:
            raise AssertionError('Comparison operator not supported. Supported '
                                 'comparison operators for %s are >=, > and =.' % sim_type)
    return True


def validate_comp_op(comp_op: str) -> bool:
    if comp_op not in COMP_OP_MAP:
        raise AssertionError('Comparison operator not supported. Supported '
                             'comparison operators are >=, >, <=, <, = and !=.')
    return True
