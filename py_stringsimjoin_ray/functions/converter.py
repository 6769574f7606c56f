"""Numeric → string column converters preserving NaN
(reference: ``/root/reference/py_stringsimjoin/utils/converter.py``):
int columns stringify directly; float columns whose non-NaN values are all
integral render without the ``.0`` suffix; NaNs stay NaN."""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd


def dataframe_column_to_str(dataframe, col_name, inplace=False,
                            return_col=False):
    if not isinstance(dataframe, pd.DataFrame):
        raise AssertionError('First argument is not of type pandas dataframe')
    if col_name not in dataframe.columns:
        raise AssertionError("Column '" + col_name + "' not found in the"
                             " input dataframe")
    if not isinstance(inplace, bool):
        raise AssertionError("Parameter 'inplace' is not of type bool")
    if not isinstance(return_col, bool):
        raise AssertionError("Parameter 'return_col' is not of type bool")
    if inplace and return_col:
        raise AssertionError("Both 'inplace' and 'return_col' parameters"
                             "cannot be set to True")

    if inplace:
        num_rows = len(dataframe[col_name])
        if num_rows == 0 or sum(pd.isnull(dataframe[col_name])) == num_rows:
            dataframe[col_name] = dataframe[col_name].astype(object)
            return True
        dataframe[col_name] = series_to_str(dataframe[col_name], False)
        return True
    if return_col:
        return series_to_str(dataframe[col_name], inplace)
    dataframe_copy = dataframe.copy()
    dataframe_copy[col_name] = series_to_str(dataframe_copy[col_name], False)
    return dataframe_copy


def series_to_str(series, inplace=False):
    if not isinstance(series, pd.Series):
        raise AssertionError('First argument is not of type pandas dataframe')
    if not isinstance(inplace, bool):
        raise AssertionError("Parameter 'inplace' is not of type bool")

    col_type = series.dtype
    if len(series) == 0:
        if col_type == object and inplace:
            return True
        return series.astype(object)

    if col_type == object:
        return True if inplace else series.copy()
    if np.issubdtype(col_type, np.integer):
        col_str = series.astype(str)
        if inplace:
            with warnings.catch_warnings():
                warnings.simplefilter('ignore', FutureWarning)
                series.update(col_str)
            return True
        return col_str
    if np.issubdtype(col_type, np.floating):
        col_non_nan = series.dropna()
        if len(col_non_nan) == 0:
            return series.astype(object)
        int_values = sum(col_non_nan.apply(lambda v: float(v).is_integer()))
        if int_values == len(col_non_nan):
            col_str = series.apply(
                lambda v: np.nan if pd.isnull(v) else str(int(v)))
        else:
            col_str = series.apply(
                lambda v: np.nan if pd.isnull(v) else str(v))
        if inplace:
            with warnings.catch_warnings():
                warnings.simplefilter('ignore', FutureWarning)
                series.update(col_str)
            return True
        return col_str
    raise TypeError('Invalid column type. '
                    'Cannot convert the column to string.')
