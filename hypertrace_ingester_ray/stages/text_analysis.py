"""Text-analysis operators for large-scale training-data pipelines.

These extend the engine beyond the reference's operator set (SURVEY.md §2 is
telemetry-shaped) with the document-pipeline operations a 100 TB text corpus
needs: token counting, quality scoring, language ID, fingerprinting.  All are
stateless vectorized ``map_batches`` kernels over the ``documents`` table
(``doc_id, text, lang, source, n_chars``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

# Tiny per-language stopword lists for the n-gram/stopword language heuristic.
# Deliberately simple + deterministic (the corpus here is synthetic); the
# operator shape (per-language token-hit scoring, argmax) is the real thing.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "y", "que"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ein"],
    "zh": ["的", "是", "了", "在", "我"],
}

QUALITY_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """doc → token/char statistics (single-space tokenization, matching the
    DuckDB oracle's string_split)."""
    tokens = pc.split_pattern(batch["text"], " ")
    n_tokens = pc.cast(pc.list_value_length(tokens), pa.int64())
    n_chars = pc.cast(pc.utf8_length(batch["text"]), pa.int64())
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": n_tokens,
            "n_chars": n_chars,
        }
    )


def quality_score_batch(batch: pa.Table) -> pa.Table:
    """Quality signals: token count, mean token length ×100 (integer, exact),
    stopword hits — length/punct/stopword-ratio style scoring."""
    text = batch["text"]
    tokens = pc.split_pattern(text, " ")
    n_tokens = pc.cast(pc.list_value_length(tokens), pa.int64())
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    # mean token length in integer permille to keep the oracle float-free:
    # (chars - spaces) * 1000 / tokens
    n_spaces = pc.subtract(n_tokens, 1)
    letters = pc.subtract(n_chars, n_spaces)
    mean_tok_len_x1000 = pc.cast(
        pc.divide(pc.multiply(letters, 1000), pc.max_element_wise(n_tokens, 1)),
        pa.int64(),
    )
    flat = tokens.combine_chunks().flatten()
    hit = pc.is_in(flat, value_set=pa.array(QUALITY_STOPWORDS))
    offsets = tokens.combine_chunks().offsets.to_numpy(zero_copy_only=False)
    hits_np = pc.cast(hit, pa.int64()).to_numpy(zero_copy_only=False)
    per_doc = np.add.reduceat(hits_np, offsets[:-1]) if len(hits_np) else np.zeros(0, np.int64)
    per_doc = np.where(np.diff(offsets) == 0, 0, per_doc)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": n_tokens,
            "mean_tok_len_x1000": mean_tok_len_x1000,
            "n_stopwords": pa.array(per_doc.astype(np.int64)),
        }
    )


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Stopword-hit argmax language ID (ties broken by language-code order)."""
    tokens = pc.split_pattern(batch["text"], " ").combine_chunks()
    flat = tokens.flatten()
    offsets = tokens.offsets.to_numpy(zero_copy_only=False)
    langs = sorted(STOPWORDS)
    scores = np.zeros((len(langs), batch.num_rows), dtype=np.int64)
    for i, lang in enumerate(langs):
        hit = pc.cast(
            pc.is_in(flat, value_set=pa.array(STOPWORDS[lang])), pa.int64()
        ).to_numpy(zero_copy_only=False)
        per_doc = (
            np.add.reduceat(hit, offsets[:-1]) if len(hit) else np.zeros(0, np.int64)
        )
        scores[i] = np.where(np.diff(offsets) == 0, 0, per_doc)
    best = np.argmax(scores, axis=0)  # first max wins → language-code order
    pred = np.array(langs, dtype=object)[best]
    pred[scores.max(axis=0) == 0] = "unknown"
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "pred_lang": pa.array(pred, pa.string()),
            "stopword_hits": pa.array(scores.max(axis=0)),
        }
    )


def fingerprint_batch(batch: pa.Table, ngram: int = 5) -> pa.Table:
    """Document fingerprint: min rolling hash over word n-grams (winnowing-
    style content fingerprint for near-dup candidate generation).

    Vectorized: one ``shingle_hashes`` pass over the batch (flat token-hash
    array + rolling combine), per-doc min via ``np.minimum.reduceat``.
    Short docs (< ngram words) fingerprint their whole text — the fallback
    shingle ``shingle_hashes`` already provides.
    """
    from ..functions.hashing import shingle_hashes

    sh, soff = shingle_hashes(batch["text"], ngram)
    if len(sh):
        fps = np.minimum.reduceat(sh, soff[:-1]).astype(np.int64)
    else:
        fps = np.empty(0, dtype=np.int64)
    return pa.table({"doc_id": batch["doc_id"], "fingerprint": pa.array(fps)})


def token_stats(ds: Dataset) -> Dataset:
    return ds.map_batches(token_stats_batch, batch_format="pyarrow")


def quality_scores(ds: Dataset) -> Dataset:
    return ds.map_batches(quality_score_batch, batch_format="pyarrow")


def lang_id(ds: Dataset) -> Dataset:
    return ds.map_batches(lang_id_batch, batch_format="pyarrow")


def fingerprints(ds: Dataset) -> Dataset:
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow")
