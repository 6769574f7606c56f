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
        tok_cache: dict = {}

        def toks(v):
            if v not in tok_cache:
                tok_cache[v] = tokenizer.tokenize(v)
            return tok_cache[v]

        keep, scores = [], []
        lvals = lt[l_match_attr]
        rvals = rt[r_match_attr]
        for lk, rk in zip(batch[candset_l_key_attr], batch[candset_r_key_attr]):
            lv, rv = lvals[lk], rvals[rk]
            if pd.isnull(lv) or pd.isnull(rv):
                keep.append(bool(allow_missing))
                scores.append(np.nan)
                continue
            if tokenizer is not None:
                lv, rv = toks(lv), toks(rv)
            s = sim_function(lv, rv)
            scores.append(s)
            keep.append(bool(comp_fn(s, threshold)))
        out = batch.copy()
        out['__score'] = scores
        return out[np.asarray(keep, dtype=bool)]

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
