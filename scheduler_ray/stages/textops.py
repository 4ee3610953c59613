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


def fingerprint_batch(batch: pd.DataFrame, window: int = 8) -> pd.DataFrame:
    """Winnowing-style rolling-hash fingerprint: min token-window hash.

    Deterministic 64-bit content fingerprint robust to reordering outside
    the window; usable as a cheap near-dup blocking key.
    """
    fps = np.zeros(len(batch), np.uint64)
    for i, text in enumerate(batch["text"]):
        toks = text.lower().split()
        if not toks:
            continue
        grams = [" ".join(toks[j : j + window]) for j in range(max(1, len(toks) - window + 1))]
        h = pd.util.hash_array(np.array(grams, dtype=object)).astype(np.uint64)
        fps[i] = h.min()
    return pd.DataFrame({"doc_id": batch["doc_id"], "fingerprint": fps})


def fingerprint_stage(docs: Dataset) -> Dataset:
    return docs.map_batches(fingerprint_batch, batch_format="pandas")
