"""Text-analysis batch kernels for large-scale corpus pipelines (beyond the
reference's surface; required engine components for training-data prep):
token counting, quality scoring, language-ID heuristic, document
fingerprinting.  All are vectorized per-batch functions usable directly in
``Dataset.map_batches`` (pyarrow in / pyarrow out)."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WS_RE = re.compile(r'\s+')
_BPEISH_RE = re.compile(r"\w+|[^\w\s]")

# tiny built-in stopword lists for the language-ID heuristic
STOPWORDS = {
    'en': {'the', 'and', 'of', 'to', 'a', 'in', 'is', 'it', 'for', 'that'},
    'de': {'der', 'die', 'das', 'und', 'ist', 'nicht', 'ein', 'zu', 'mit'},
    'fr': {'le', 'la', 'les', 'et', 'est', 'un', 'une', 'pour', 'dans'},
}


def token_count_batch(batch: pa.Table, text_col: str = 'text') -> pa.Table:
    """whitespace token count + a BPE-ish regex token count per row."""
    texts = batch[text_col].to_pylist()
    ws = np.fromiter((len(t.split()) if t is not None else 0 for t in texts),
                     dtype=np.int64, count=len(texts))
    bpe = np.fromiter((len(_BPEISH_RE.findall(t)) if t is not None else 0
                       for t in texts), dtype=np.int64, count=len(texts))
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


def langid_batch(batch: pa.Table, text_col: str = 'text') -> pa.Table:
    """Stopword-vote language ID over {en, de, fr}; 'und' (undetermined) when
    no stopword hits.  Ties broken by language code order."""
    texts = batch[text_col].to_pylist()
    langs = []
    for t in texts:
        words = set((t or '').lower().split())
        scores = {lang: len(words & sw) for lang, sw in STOPWORDS.items()}
        best = max(sorted(scores), key=lambda k: scores[k])
        langs.append(best if scores[best] > 0 else 'und')
    out = batch.select([c for c in batch.column_names if c != text_col])
    return out.append_column('lang_pred', pa.array(langs, pa.string()))


_FP_BASE = 1000003
_FP_M61 = (1 << 61) - 1


def fingerprint64(text: str) -> int:
    """Rolling polynomial document fingerprint over the whitespace-token
    stream (order-sensitive, whitespace-insensitive): Horner evaluation of
    Σ md5₆₄(tokᵢ)·B^(n−1−i) mod (2⁶¹−1).  Per-token md5 (not per-byte)
    keeps it fast, and the closed polynomial form makes the value exactly
    reproducible in SQL (DuckDB ``md5_number_upper`` + a powers CTE), which
    is what the driver's oracle gate does."""
    import hashlib
    h = 0
    for tok in text.split():
        th = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8],
                            'little') % _FP_M61
        h = (h * _FP_BASE + th) % _FP_M61
    return h


def fingerprint_batch(batch: pa.Table, text_col: str = 'text') -> pa.Table:
    texts = batch[text_col].to_pylist()
    fps = np.fromiter((fingerprint64(t or '') for t in texts),
                      dtype=np.int64, count=len(texts))
    out = batch.select([c for c in batch.column_names if c != text_col])
    return out.append_column('fingerprint', pa.array(fps))
