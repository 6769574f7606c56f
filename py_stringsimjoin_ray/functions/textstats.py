"""Text-analysis batch kernels for large-scale corpus pipelines (beyond the
reference's surface; required engine components for training-data prep):
token counting, quality scoring, language-ID heuristic, document
fingerprinting.  All are vectorized per-batch functions usable directly in
``Dataset.map_batches`` (pyarrow in / pyarrow out).

Regex semantics are RE2 (pyarrow.compute), matching the DuckDB SQL oracles
bit-for-bit — both sides run the same regex engine, so there is no
Python-`re`-vs-RE2 divergence on exotic whitespace or word characters.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# tiny built-in stopword lists for the language-ID heuristic
STOPWORDS = {
    'en': {'the', 'and', 'of', 'to', 'a', 'in', 'is', 'it', 'for', 'that'},
    'de': {'der', 'die', 'das', 'und', 'ist', 'nicht', 'ein', 'zu', 'mit'},
    'fr': {'le', 'la', 'les', 'et', 'est', 'un', 'une', 'pour', 'dans'},
}


def token_count_batch(batch: pa.Table, text_col: str = 'text') -> pa.Table:
    """whitespace token count + a BPE-ish regex token count per row —
    both as single vectorized RE2 passes over the column."""
    col = pc.fill_null(batch[text_col], '')
    ws = pc.count_substring_regex(col, r'\S+') \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    bpe = pc.count_substring_regex(col, r'\w+|[^\w\s]') \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    out = batch.select([c for c in batch.column_names if c != text_col])
    out = out.append_column('n_tokens', pa.array(ws))
    out = out.append_column('n_bpeish_tokens', pa.array(bpe))
    return out


def quality_score_batch(batch: pa.Table, text_col: str = 'text') -> pa.Table:
    """Deterministic quality metrics: char/token counts, mean token length,
    punctuation & uppercase ratios.  Formulas are plain integer counts and a
    single float division each, so a SQL oracle can reproduce them
    bit-exactly."""
    col = pc.fill_null(batch[text_col], '')
    n_chars = pc.utf8_length(col).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    n_tok = pc.count_substring_regex(col, r'\S+') \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    punct = pc.count_substring_regex(col, r'[.,;:!?]') \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    upper = pc.count_substring_regex(col, r'[A-Z]') \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    denom = np.maximum(n_chars, 1).astype(np.float64)
    out = batch.select([c for c in batch.column_names if c != text_col])
    out = out.append_column('n_chars_calc', pa.array(n_chars))
    out = out.append_column('n_tokens', pa.array(n_tok))
    out = out.append_column('punct_ratio', pa.array(punct / denom))
    out = out.append_column('upper_ratio', pa.array(upper / denom))
    out = out.append_column(
        'mean_token_len',
        pa.array((n_chars - np.maximum(n_tok - 1, 0)) /
                 np.maximum(n_tok, 1).astype(np.float64)))
    return out


def _split_ws_re2(col: pa.Array) -> pa.Array:
    """Split a string column on RE2 whitespace ([\\t\\n\\f\\r ]).

    ``ascii_split_whitespace`` is ~6× faster than ``split_pattern_regex``
    but additionally splits on \\v — so it is used only when a single
    cheap containment scan shows the batch holds no \\v at all (true for
    any real corpus); otherwise fall back to the exact regex split."""
    has_vt = pc.any(pc.match_substring(col, '\x0b')).as_py()
    if has_vt:
        return pc.split_pattern_regex(col, r'\s+')
    return pc.ascii_split_whitespace(col)


def langid_batch(batch: pa.Table, text_col: str = 'text') -> pa.Table:
    """Stopword-vote language ID over {en, de, fr}: score = number of
    DISTINCT stopwords of that language present in the whitespace-token
    set; 'und' (undetermined) when no stopword hits; ties broken by
    language code order.

    Vectorized: one lowercase + one split over the column, then a single
    hash-table ``index_in`` probe of every token against the 28-word
    stopword list; per-row distinct-stopword counts come from one
    ``np.unique`` over packed (row, stopword) keys — no per-row Python."""
    low = pc.utf8_lower(pc.fill_null(batch[text_col], ''))
    n = len(low)
    langs_sorted = sorted(STOPWORDS)
    # (word → stopword id, stopword id → language index); the built-in
    # lists are disjoint across languages, which the id scheme relies on
    sw_words, sw_lang = [], []
    for li, lang in enumerate(langs_sorted):
        for w in sorted(STOPWORDS[lang]):
            sw_words.append(w)
            sw_lang.append(li)
    sw_lang = np.asarray(sw_lang, dtype=np.int64)

    toks = _split_ws_re2(low)
    flat = pc.list_flatten(toks)
    sizes = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    swid = pc.fill_null(
        pc.index_in(flat, value_set=pa.array(sw_words)), -1) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    hit_pos = np.nonzero(swid >= 0)[0]
    counts = np.zeros((len(langs_sorted), n), dtype=np.int64)
    if len(hit_pos):
        # row of each HIT token via its flat position (stopword hits are
        # sparse, so this beats materializing a row id for every token)
        bounds = np.cumsum(sizes)
        row_hit = np.searchsorted(bounds, hit_pos, side='right')
        packed = np.unique(row_hit * len(sw_words) + swid[hit_pos])
        np.add.at(counts,
                  (sw_lang[packed % len(sw_words)],
                   packed // len(sw_words)), 1)
    best = counts.argmax(axis=0)          # first max wins → code order
    pred = np.asarray(langs_sorted, dtype=object)[best]
    pred[counts.max(axis=0) == 0] = 'und'
    out = batch.select([c for c in batch.column_names if c != text_col])
    return out.append_column('lang_pred', pa.array(pred, pa.string()))


def token_frequency_partials(batch: pa.Table,
                             text_col: str = 'text') -> pa.Table:
    """Per-batch token-frequency combiner: one ``(token, count)`` row per
    DISTINCT whitespace token in the batch (RE2 semantics, same as every
    other textstats kernel).  Arrow split + dictionary-encode + one bincount
    — no per-row Python."""
    col = pc.fill_null(batch[text_col], '')
    flat = pc.list_flatten(_split_ws_re2(col)).combine_chunks()
    keep = pc.not_equal(flat, '')
    flat = flat.filter(keep)
    if len(flat) == 0:
        return pa.table({'token': pa.array([], pa.string()),
                         'count': pa.array([], pa.int64())})
    d = pc.dictionary_encode(flat)
    counts = np.bincount(d.indices.to_numpy(zero_copy_only=False),
                         minlength=len(d.dictionary))
    return pa.table({'token': d.dictionary.cast(pa.string()),
                     'count': pa.array(counts.astype(np.int64))})


def top_tokens(ds, text_col: str = 'text', k: int = 50):
    """Exact corpus-wide top-k most frequent whitespace tokens, ties broken
    by token ascending.  Scale shape: per-batch partial counts (combiner) →
    bucketed global sum (``stages/groupagg.py``: each token is finalized in
    exactly one bucket) → per-block top-k candidates → driver merge of
    ≤ blocks·k rows.  The full vocabulary never reaches the driver."""
    import pandas as pd

    from ..stages.groupagg import bucketed_group_agg

    partials = ds.map_batches(
        lambda b: token_frequency_partials(b, text_col),
        batch_format='pyarrow')
    merged = bucketed_group_agg(partials, ['token'],
                                [('count', 'count', 'sum')])

    def block_topk(batch: pa.Table) -> pa.Table:
        df = batch.select(['token', 'count']).to_pandas()
        if len(df) > k:
            df = df.sort_values(['count', 'token'],
                                ascending=[False, True],
                                kind='mergesort').head(k)
        return pa.Table.from_pandas(df, preserve_index=False) \
            .replace_schema_metadata(None)
    block_topk.__name__ = 'token_block_topk'

    cand = merged.map_batches(block_topk, batch_format='pyarrow').to_pandas()
    if cand.empty:
        return pd.DataFrame({'token': pd.Series([], dtype=object),
                             'count': pd.Series([], dtype=np.int64)})
    out = cand.sort_values(['count', 'token'], ascending=[False, True],
                           kind='mergesort', ignore_index=True).head(k)
    out['count'] = out['count'].astype(np.int64)
    return out


_FP_BASE = np.uint64(1000003)
_FP_M61 = (1 << 61) - 1
_M61 = np.uint64(_FP_M61)


_RE2_WS_SPLIT = None  # compiled lazily: RE2's \s class, [\t\n\f\r ]


def _re2_tokens(text: str) -> list[str]:
    """Whitespace tokens under RE2 semantics (\\s = [\\t\\n\\f\\r ],
    measured identical in pyarrow and DuckDB) — the ONE tokenization all
    textstats kernels and their SQL oracles share.  Python ``str.split``
    differs on \\v, \\x1c–\\x1f, NEL and NBSP."""
    global _RE2_WS_SPLIT
    if _RE2_WS_SPLIT is None:
        import re
        _RE2_WS_SPLIT = re.compile('[\t\n\f\r ]+')
    return [t for t in _RE2_WS_SPLIT.split(text) if t]


def fingerprint64(text: str) -> int:
    """Rolling polynomial document fingerprint over the whitespace-token
    stream (order-sensitive, whitespace-insensitive): Horner evaluation of
    Σ md5₆₄(tokᵢ)·B^(n−1−i) mod (2⁶¹−1).  Per-token md5 (not per-byte)
    keeps it fast, and the closed polynomial form makes the value exactly
    reproducible in SQL (DuckDB ``md5_number_upper`` + a powers CTE), which
    is what the driver's oracle gate does.

    This scalar form is the DEFINITION; ``fingerprint_batch`` is the
    vectorized batch kernel pinned against it by tests."""
    h = 0
    for tok in _re2_tokens(text):
        th = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8],
                            'little') % _FP_M61
        h = (h * 1000003 + th) % _FP_M61
    return h


def _mod61(x: np.ndarray) -> np.ndarray:
    """Reduce uint64 values (< 2^63) mod the Mersenne prime 2^61-1."""
    x = (x & _M61) + (x >> np.uint64(61))
    x = (x & _M61) + (x >> np.uint64(61))
    return np.where(x >= _M61, x - _M61, x)


def _mulmod_base(h: np.ndarray) -> np.ndarray:
    """h·B mod (2^61−1) for h < 2^61, B = 1000003 < 2^20, without 128-bit
    intermediates: split h = hh·2^41 + hl; hh·B < 2^40, so hh·B·2^41 folds
    as (t>>20) + (t&(2^20−1))·2^41 — every addend < 2^61, sum < 2^63."""
    hh = h >> np.uint64(41)
    hl = h & np.uint64((1 << 41) - 1)
    t = hh * _FP_BASE
    acc = hl * _FP_BASE + (t >> np.uint64(20)) \
        + ((t & np.uint64((1 << 20) - 1)) << np.uint64(41))
    return _mod61(acc)


def fingerprint_batch(batch: pa.Table, text_col: str = 'text') -> pa.Table:
    """Vectorized fingerprint64 over a batch.

    Tokenization and token dedup are Arrow kernels
    (``split_pattern_regex`` → flatten → ``dictionary_encode``), so md5
    runs ONCE per distinct token in the batch (natural-language corpora
    repeat tokens heavily).  The Horner recurrence is evaluated in
    lockstep across rows: max_tokens sequential steps, each a numpy
    multiply-add-mod over every still-active row."""
    col = pc.fill_null(batch[text_col], '')
    n_rows = len(col)
    toks = _split_ws_re2(col)
    flat = pc.list_flatten(toks)
    sizes = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    # drop the empty strings split_pattern_regex emits at string edges
    keep = pc.not_equal(flat, '').to_numpy(zero_copy_only=False)
    row_of = np.repeat(np.arange(n_rows, dtype=np.int64), sizes)[keep]
    flat = flat.filter(pa.array(keep))
    # md5 once per DISTINCT token
    dict_arr = pc.dictionary_encode(flat.combine_chunks())
    uniq = dict_arr.dictionary.to_pylist()
    uhash = np.fromiter(
        (int.from_bytes(hashlib.md5(t.encode()).digest()[:8],
                        'little') % _FP_M61 for t in uniq),
        dtype=np.uint64, count=len(uniq))
    codes = dict_arr.indices.to_numpy(zero_copy_only=False)
    tok_hash = uhash[codes] if len(codes) else np.empty(0, np.uint64)
    counts = np.bincount(row_of, minlength=n_rows).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    h = np.zeros(n_rows, dtype=np.uint64)
    max_len = int(counts.max()) if n_rows else 0
    for p in range(max_len):
        active = np.nonzero(counts > p)[0]
        th = tok_hash[offsets[active] + p]
        h[active] = _mod61(_mulmod_base(h[active]) + th)
    out = batch.select([c for c in batch.column_names if c != text_col])
    return out.append_column('fingerprint', pa.array(h.astype(np.int64)))


def normalize_text_batch(batch: pa.Table, text_col: str = 'text',
                         out_col: str = 'text_norm') -> pa.Table:
    """Training-data text normalization, fully Arrow-vectorized: casefold
    (utf8_lower), collapse every whitespace run to one space, strip leading
    and trailing whitespace.  Mirrors the usual pre-dedup canonicalization
    step; oracle: ``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))``."""
    col = batch[text_col]
    lowered = pc.utf8_lower(col)
    squeezed = pc.replace_substring_regex(lowered, r'\s+', ' ')
    trimmed = pc.utf8_trim_whitespace(squeezed)
    return batch.append_column(out_col, trimmed)
