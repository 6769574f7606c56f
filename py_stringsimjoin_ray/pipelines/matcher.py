"""apply_matcher — refine a candidate set with an arbitrary similarity
function (reference: ``/root/reference/py_stringsimjoin/matcher/apply_matcher.py``).

Ray-Data shape: the candset streams through ``map_batches``; the two source
tables' (key → match-attr value) maps are broadcast via ``ray.put`` and
fetched once per task (the reference instead copies both full tables into
every joblib worker, ``apply_matcher.py:254-260``).  The user-supplied
``sim_function`` and tokenizer ride along as serialized state (Ray's
cloudpickle replaces the reference's copyreg hooks, ``utils/pickle.py``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from ..core import validation as V
from ..core.comp_ops import COMP_OP_MAP
from .join import _remove_redundant_attrs, _to_dataset, output_header


def apply_matcher(candset, candset_l_key_attr, candset_r_key_attr,
                  ltable, rtable, l_key_attr, r_key_attr,
                  l_match_attr, r_match_attr, tokenizer, sim_function,
                  threshold, comp_op='>=', allow_missing=False,
                  l_out_attrs=None, r_out_attrs=None,
                  l_out_prefix='l_', r_out_prefix='r_', out_sim_score=True,
                  n_jobs=1, show_progress=False):
    """Find matching pairs from the candidate set by applying
    ``sim_function`` on the match attribute (token lists if a tokenizer is
    given, raw values otherwise); keep pairs whose score satisfies
    ``comp_op(score, threshold)``.  The candset ``_id`` (first column) is
    preserved."""
    V.validate_input_table(candset, 'candset')
    cand_cols = V.table_columns(candset)
    V.validate_attr(candset_l_key_attr, cand_cols, 'left key attribute', 'candset')
    V.validate_attr(candset_r_key_attr, cand_cols, 'right key attribute', 'candset')
    V.validate_input_table(ltable, 'left table')
    V.validate_input_table(rtable, 'right table')
    l_cols, r_cols = V.table_columns(ltable), V.table_columns(rtable)
    V.validate_attr(l_key_attr, l_cols, 'key attribute', 'left table')
    V.validate_attr(r_key_attr, r_cols, 'key attribute', 'right table')
    V.validate_attr(l_match_attr, l_cols, 'match attribute', 'left table')
    V.validate_attr(r_match_attr, r_cols, 'match attribute', 'right table')
    V.validate_output_attrs(l_out_attrs, l_cols, r_out_attrs, r_cols)
    if tokenizer is not None:
        V.validate_tokenizer(tokenizer)
    V.validate_comp_op(comp_op)
    if isinstance(ltable, pd.DataFrame):
        V.validate_key_attr(l_key_attr, ltable, 'left table')
        V.validate_key_attr(r_key_attr, rtable, 'right table')

    cand_pd = candset if isinstance(candset, pd.DataFrame) else candset.to_pandas()
    if cand_pd.empty:
        return cand_pd

    l_out_attrs = _remove_redundant_attrs(l_out_attrs, l_key_attr)
    r_out_attrs = _remove_redundant_attrs(r_out_attrs, r_key_attr)

    l_pd = ltable if isinstance(ltable, pd.DataFrame) else ltable.to_pandas()
    r_pd = rtable if isinstance(rtable, pd.DataFrame) else rtable.to_pandas()

    l_need = list(dict.fromkeys([l_key_attr, l_match_attr] + (l_out_attrs or [])))
    r_need = list(dict.fromkeys([r_key_attr, r_match_attr] + (r_out_attrs or [])))
    l_ref = ray.put(l_pd[l_need].set_index(l_key_attr, drop=False))
    r_ref = ray.put(r_pd[r_need].set_index(r_key_attr, drop=False))

    comp_fn = COMP_OP_MAP[comp_op]
    id_col = cand_pd.columns[0]

    def score_batch(batch: pd.DataFrame) -> pd.DataFrame:
        lt = ray.get(l_ref)
        rt = ray.get(r_ref)
        # one vectorized positional gather per side instead of a pandas
        # label lookup per pair
        li = lt.index.get_indexer(batch[candset_l_key_attr])
        ri = rt.index.get_indexer(batch[candset_r_key_attr])
        if (li < 0).any() or (ri < 0).any():
            bad = (batch[candset_l_key_attr][li < 0].tolist()
                   + batch[candset_r_key_attr][ri < 0].tolist())
            raise KeyError(f'candset keys not present in the input tables: '
                           f'{bad[:5]}')
        lv_all = lt[l_match_attr].to_numpy()[li]
        rv_all = rt[r_match_attr].to_numpy()[ri]
        null_mask = pd.isnull(lv_all) | pd.isnull(rv_all)

        if tokenizer is not None:
            # tokenize each distinct string once per batch
            tok_cache = {}
            for v in pd.unique(np.concatenate([lv_all[~null_mask],
                                               rv_all[~null_mask]])):
                tok_cache[v] = tokenizer.tokenize(v)
            get = tok_cache.get
        else:
            get = lambda v: v  # noqa: E731 - raw-value contract

        scores = np.full(len(batch), np.nan)
        keep = np.full(len(batch), bool(allow_missing))
        for i in np.flatnonzero(~null_mask):
            s = sim_function(get(lv_all[i]), get(rv_all[i]))
            scores[i] = s
            keep[i] = bool(comp_fn(s, threshold))
        out = batch.copy()
        out['__score'] = scores
        return out[keep]

    cand_ds = _to_dataset(cand_pd)
    kept = cand_ds.map_batches(score_batch, batch_format='pandas').to_pandas()

    header = output_header(l_key_attr, r_key_attr, l_out_attrs, r_out_attrs,
                           l_out_prefix, r_out_prefix)
    out = pd.DataFrame({'_id': kept[id_col].to_numpy() if len(kept) else [],
                        header[0]: kept[candset_l_key_attr].to_numpy() if len(kept) else [],
                        header[1]: kept[candset_r_key_attr].to_numpy() if len(kept) else []})
    if l_out_attrs:
        lmap = l_pd.set_index(l_key_attr)
        for a in l_out_attrs:
            out[l_out_prefix + a] = (lmap[a].reindex(kept[candset_l_key_attr]).to_numpy()
                                     if len(kept) else np.array([]))
    if r_out_attrs:
        rmap = r_pd.set_index(r_key_attr)
        for a in r_out_attrs:
            out[r_out_prefix + a] = (rmap[a].reindex(kept[candset_r_key_attr]).to_numpy()
                                     if len(kept) else np.array([]))
    if out_sim_score:
        out['_sim_score'] = kept['__score'].to_numpy() if len(kept) else []
    return out
