"""Text-analysis operators over the ``documents`` table.

Training-data pipeline ops: language ID (stopword heuristic), quality
scoring (length/punct/stopword ratios), token counting (whitespace + a
BPE-ish regex), and rolling-hash document fingerprinting.  All are
vectorized ``map_batches`` stages; the regex/stopword state is compiled
once per worker via the LangId actor class (SURVEY.md §2.3 pattern).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ray.data import Dataset

#: tiny per-language stopword sets for the n-gram/stopword heuristic
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "las"},
    "fr": {"le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"},
}

_WORD_RE = re.compile(r"\S+")
#: BPE-ish pre-tokenizer: word pieces, numbers, punctuation runs
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")
#: explicit ASCII class — pinned to the same semantics as the DuckDB (RE2)
#: oracle's ``[^\w\s]``, whose ``\w`` is ASCII-only; Python's Unicode ``\w``
#: would classify non-ASCII letters differently (ADVICE r1)
_PUNCT_RE = re.compile(r"[^A-Za-z0-9_\s]")


def token_count_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Whitespace tokens + BPE-ish subword-piece counts (vectorized)."""
    ws = batch["text"].str.count(_WORD_RE).astype("int64")
    bpe = batch["text"].str.count(_BPE_RE).astype("int64")
    return pd.DataFrame({"doc_id": batch["doc_id"], "ws_tokens": ws, "bpe_tokens": bpe})


def token_count_stage(docs: Dataset) -> Dataset:
    return docs.map_batches(token_count_batch, batch_format="pandas")


def quality_score_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Length / punctuation-ratio / mean-word-length quality features.

    Ratios are rounded to 6 decimals so the DuckDB oracle can reproduce
    them bit-stably with the same rounding.
    """
    text = batch["text"]
    n_chars = text.str.len().astype("int64")
    n_tokens = text.str.count(_WORD_RE).astype("int64")
    n_punct = text.str.count(_PUNCT_RE).astype("int64")
    n_nonspace = text.str.count(r"\S").astype("int64")
    punct_ratio = (n_punct / n_chars.clip(lower=1)).round(6)
    mean_word_len = (n_nonspace / n_tokens.clip(lower=1)).round(6)
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "punct_ratio": punct_ratio,
            "mean_word_len": mean_word_len,
        }
    )


def quality_stage(docs: Dataset) -> Dataset:
    return docs.map_batches(quality_score_batch, batch_format="pandas")


class LangId:
    """Actor-pool language-ID: stopword tables + regex compiled once per
    worker (``__init__``), scored per batch (``__call__``)."""

    def __init__(self):
        self.word = re.compile(r"[a-zà-ÿäöüß]+")
        self.tables = {lang: sw for lang, sw in _STOPWORDS.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        preds = []
        for text in batch["text"]:
            toks = self.word.findall(text.lower())
            best, best_n = "other", 0
            for lang, sw in self.tables.items():
                nhits = sum(1 for t in toks if t in sw)
                if nhits > best_n:
                    best, best_n = lang, nhits
            preds.append(best)
        return pd.DataFrame({"doc_id": batch["doc_id"], "lang_pred": preds})


def langid_stage(docs: Dataset, concurrency=(1, 4)) -> Dataset:
    return docs.map_batches(LangId, batch_format="pandas", concurrency=concurrency)


_FP_BASE = np.uint64(1099511628211)  # FNV prime


def fingerprint_batch(batch: pd.DataFrame, window: int = 8) -> pd.DataFrame:
    """Winnowing-style rolling-hash fingerprint: min token-window hash.

    Deterministic 64-bit content fingerprint robust to reordering outside
    the window; usable as a cheap near-dup blocking key.

    Vectorized over the whole batch (round-1 verdict item 6): one token
    hash pass, every doc zero-padded to ≥ ``window`` tokens, then the
    window polynomial is ``window`` shifted multiply-adds over the flat
    array and the per-doc min is one ``np.minimum.reduceat``.  (The gram
    hash is a token-hash polynomial rather than a string hash of the
    joined gram — same fingerprint properties, no gram string
    materialization.)
    """
    n = len(batch)
    tok_lists = batch["text"].str.lower().str.split()
    lens = tok_lists.map(len).to_numpy(np.int64)
    fps = np.zeros(n, np.uint64)
    if lens.sum() == 0:
        return pd.DataFrame({"doc_id": batch["doc_id"], "fingerprint": fps})
    # zero-pad every doc to at least `window` tokens so each doc has
    # exactly max(len, w) - w + 1 = max(1, len - w + 1) full windows
    padded = np.maximum(lens, window)
    total = int(padded.sum())
    h = np.zeros(total, np.uint64)
    offsets = np.zeros(n, np.int64)
    np.cumsum(padded[:-1], out=offsets[1:])
    pos = np.concatenate(
        [off + np.arange(ln) for off, ln in zip(offsets, lens) if ln]
    )
    flat = np.concatenate([np.array(t, object) for t in tok_lists if len(t)])
    h[pos] = pd.util.hash_array(flat).astype(np.uint64)
    # rolling window polynomial over the flat array (window is a small
    # constant → `window` vectorized multiply-adds)
    n_win = total - window + 1
    poly = np.zeros(n_win, np.uint64)
    for k in range(window):
        poly = poly * _FP_BASE + h[k : k + n_win]
    # windows that straddle doc boundaries are invalid → mask to max
    doc_of_pos = np.repeat(np.arange(n, dtype=np.int64), padded)[:n_win]
    grams_per_doc = padded - window + 1
    valid = (np.arange(n_win) - offsets[doc_of_pos]) < grams_per_doc[doc_of_pos]
    poly[~valid] = np.uint64(0xFFFFFFFFFFFFFFFF)
    mins = np.minimum.reduceat(poly, np.minimum(offsets, n_win - 1))
    nonempty = lens > 0
    fps[nonempty] = mins[nonempty]
    return pd.DataFrame({"doc_id": batch["doc_id"], "fingerprint": fps})


def fingerprint_stage(docs: Dataset) -> Dataset:
    return docs.map_batches(fingerprint_batch, batch_format="pandas")
