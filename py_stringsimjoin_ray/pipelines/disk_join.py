"""disk_edit_distance_join — bounded-memory edit-distance join with a file
sink (reference: ``/root/reference/py_stringsimjoin/join/
disk_edit_distance_join.py:12-152``, Cython spill logic at
``disk_edit_distance_join_cy.pyx:244,469-481``).

The reference buffers output rows per worker and flushes CSV chunks every
``data_limit`` rows; Ray Data's streaming executor + backpressure subsume
that machinery — the match stream is never materialized, each block is
written as its own file.  ``data_limit`` is accepted for surface parity and
mapped to the Parquet row-group budget.  Returns True on success like the
reference.
"""

from __future__ import annotations

import os

from ..core import validation as V
from .join import edit_distance_join


def disk_edit_distance_join(ltable, rtable, l_key_attr, r_key_attr,
                            l_join_attr, r_join_attr, threshold,
                            output_file_path, comp_op='<=',
                            allow_missing=False, l_out_attrs=None,
                            r_out_attrs=None, l_out_prefix='l_',
                            r_out_prefix='r_', out_sim_score=True,
                            n_jobs=1, show_progress=False, tokenizer=None,
                            temp_dir=None, data_limit=100_000,
                            output_format='parquet') -> bool:
    """Stream the edit-distance join result to ``output_file_path`` (a
    directory of part files for 'parquet', one CSV file for 'csv' parity
    mode) without holding the full result in memory."""
    if data_limit is not None and (not isinstance(data_limit, int)
                                   or data_limit <= 0):
        raise AssertionError('data_limit should be greater than 0')
    out_dir = os.path.dirname(os.path.abspath(output_file_path))
    if not os.path.exists(out_dir):
        raise AssertionError('Invalid path given. Please enter an existing path.')

    pairs = edit_distance_join(ltable, rtable, l_key_attr, r_key_attr,
                               l_join_attr, r_join_attr, threshold,
                               comp_op=comp_op, allow_missing=allow_missing,
                               out_sim_score=out_sim_score,
                               tokenizer=tokenizer, output='dataset')
    import pyarrow as pa

    def rename(batch: pa.Table) -> pa.Table:
        cols = {l_out_prefix + l_key_attr: batch['l_key'],
                r_out_prefix + r_key_attr: batch['r_key']}
        if out_sim_score:
            cols['_sim_score'] = batch['_sim_score']
        return pa.table(cols)

    named = pairs.map_batches(rename, batch_format='pyarrow')
    if output_format == 'csv':
        # parity sink: single CSV assembled from streamed batches
        import csv
        with open(output_file_path, 'w', newline='') as f:
            writer = None
            for batch in named.iter_batches(batch_format='pandas',
                                            batch_size=data_limit):
                if writer is None:
                    writer = csv.writer(f)
                    writer.writerow(batch.columns)
                writer.writerows(batch.itertuples(index=False))
            if writer is None:  # empty result still writes a header
                import pandas as pd  # noqa: F401
                csv.writer(f).writerow(
                    [l_out_prefix + l_key_attr, r_out_prefix + r_key_attr]
                    + (['_sim_score'] if out_sim_score else []))
    else:
        named.write_parquet(output_file_path,
                            min_rows_per_file=min(data_limit, 1_000_000))
    return True
