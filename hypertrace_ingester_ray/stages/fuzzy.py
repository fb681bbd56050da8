"""Fuzzy (edit-distance) pair matching over a text column.

Reference parity: the reference has no fuzzy matcher — this is one of the
training-data operators beyond its surface (near-duplicate families live in
``stages/dedup.py``; this module covers the *typo-class* similarity that
shingle/MinHash misses, e.g. OCR noise or template drift in the first line).

Design (blocking + verify, same shape as the LSH chains in ``dedup.py``):

1. **Block**: each doc keyed by ``(first_char, n_chars // band)`` and emitted
   to its own length bucket AND the next one, so every pair with the same
   first character and ``|Δn_chars| <= band`` co-occurs in at least one
   bucket.  A pair is *owned* by ``max(home_a, home_b)`` — the one bucket
   where both are guaranteed present — so no pair is emitted twice.
2. **Candidate**: within a bucket, ragged all-pairs (repeat/arange — no
   Python loop), filtered to the exact ``|Δn_chars| <= band`` contract.
3. **Verify**: banded Levenshtein over the first ``prefix_len`` characters,
   vectorized ACROSS pairs — the DP runs ``prefix_len²`` numpy steps, each
   over the whole candidate array at once, instead of a per-pair loop.

The blocking contract (same first char, length band) is part of the
operator's *semantics* — the SQL oracle mirrors it exactly — and is also its
scale story: buckets are the shuffle key, all-pairs work is bounded per
bucket, and the DP touches only candidate pairs (output-sized, not
corpus-sized).  Texts are assumed single-byte-per-char (ASCII) so byte-level
DP equals character-level ``levenshtein()``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from .grouping import group_apply, run_boundaries

__all__ = ["levenshtein_pairs", "fuzzy_pairs"]


def _prefix_matrix(arr: pa.Array, max_len: int):
    """(n, max_len) uint8 matrix + length vector from a string array,
    zero-copy from the Arrow data buffer (ragged gather, no per-row loop)."""
    arr = pc.binary_slice(arr.cast(pa.binary()), 0, max_len)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)
    offs = offs[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lens = offs[1:] - offs[:-1]
    n = len(lens)
    mat = np.zeros((n, max_len), dtype=np.uint8)
    col = np.arange(max_len, dtype=np.int64)
    mask = col[None, :] < lens[:, None]
    mat[mask] = buf[(offs[:-1, None] + col[None, :])[mask]]
    return mat, lens


def levenshtein_pairs(
    a_mat: np.ndarray,
    b_mat: np.ndarray,
    a_len: np.ndarray,
    b_len: np.ndarray,
) -> np.ndarray:
    """Exact Levenshtein distance for P (a, b) byte-string pairs at once.

    Classic O(L²) DP, but every cell update is a numpy op over all P pairs
    (P-vectorized wavefront): ~L² vector steps total, no per-pair loop.
    """
    P, L = a_mat.shape
    res = np.empty(P, dtype=np.int64)
    res[a_len == 0] = b_len[a_len == 0]
    prev = np.broadcast_to(np.arange(L + 1, dtype=np.int64), (P, L + 1)).copy()
    cur = np.empty((P, L + 1), dtype=np.int64)
    for i in range(1, L + 1):
        cur[:, 0] = i
        ai = a_mat[:, i - 1]
        for j in range(1, L + 1):
            cost = (ai != b_mat[:, j - 1]).astype(np.int64)
            np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1, out=cur[:, j])
            np.minimum(cur[:, j], prev[:, j - 1] + cost, out=cur[:, j])
        hit = a_len == i
        if hit.any():
            res[hit] = cur[hit, b_len[hit]]
        prev, cur = cur, prev
    return res


def fuzzy_pairs(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    len_col: str = "n_chars",
    prefix_len: int = 24,
    band: int = 16,
    max_dist: int = 12,
    num_partitions: int = 32,
) -> Dataset:
    """All (id_a < id_b) pairs with the same first character,
    ``|Δlen| <= band``, and prefix edit distance ``<= max_dist``.

    Output: ``(doc_a, doc_b, dist)``.  SQL mirror::

        ... ON substr(a.text,1,1) = substr(b.text,1,1)
           AND abs(a.n - b.n) <= band AND a.id < b.id
           AND levenshtein(substr(a.text,1,P), substr(b.text,1,P)) <= D
    """

    def _block(batch: pa.Table) -> pa.Table:
        fc = pc.utf8_slice_codeunits(batch[text_col], 0, 1)
        home = pc.divide(batch[len_col], band).cast(pa.int64())
        pre = pc.utf8_slice_codeunits(batch[text_col], 0, prefix_len)
        base = pa.table(
            {
                "id": batch[id_col],
                "fc": fc,
                "home": home,
                "nlen": batch[len_col].cast(pa.int64()),
                "pre": pre,
            }
        )
        # each doc goes to its home bucket and the next one; "home" stays the
        # true bucket, "bk" is the bucket the copy is routed to
        own = base.append_column("bk", home)
        up = base.append_column("bk", pc.add(home, 1).cast(pa.int64()))
        return pa.concat_tables([own, up])

    blocked = ds.map_batches(_block, batch_format="pyarrow")

    def _match(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "dist": pa.array([], pa.int64()),
            }
        )
        if part.num_rows == 0:
            return empty
        fc = part["fc"].combine_chunks().dictionary_encode()
        fcodes = fc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        bk = part["bk"].to_numpy(zero_copy_only=False)
        ids = part["id"].to_numpy(zero_copy_only=False)
        nlen = part["nlen"].to_numpy(zero_copy_only=False)
        home = part["home"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bk, fcodes))
        fcodes, bk, ids, nlen, home = (
            a[order] for a in (fcodes, bk, ids, nlen, home)
        )
        bounds = run_boundaries(fcodes, bk)
        n = len(ids)
        seg_end = np.zeros(n, dtype=np.int64)
        starts = bounds[:-1]
        ends = bounds[1:]
        seg_end[starts] = ends
        seg_end = np.maximum.accumulate(seg_end)
        cnt = seg_end - 1 - np.arange(n)  # pairs (me, later-in-segment)
        total = int(cnt.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(n), cnt)
        csum = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        b_idx = a_idx + 1 + (np.arange(total) - np.repeat(csum, cnt))
        # ownership (dedup across the two bucket copies) + exact length band
        keep = (
            (np.maximum(home[a_idx], home[b_idx]) == bk[a_idx])
            & (np.abs(nlen[a_idx] - nlen[b_idx]) <= band)
            & (ids[a_idx] != ids[b_idx])
        )
        a_idx, b_idx = a_idx[keep], b_idx[keep]
        if len(a_idx) == 0:
            return empty
        mat, lens = _prefix_matrix(part["pre"].combine_chunks().take(order), prefix_len)
        dist = levenshtein_pairs(mat[a_idx], mat[b_idx], lens[a_idx], lens[b_idx])
        ok = dist <= max_dist
        a_ids, b_ids, dist = ids[a_idx[ok]], ids[b_idx[ok]], dist[ok]
        lo = np.minimum(a_ids, b_ids)
        hi = np.maximum(a_ids, b_ids)
        return pa.table({"doc_a": lo, "doc_b": hi, "dist": dist})

    return group_apply(
        blocked, ["fc", "bk"], _match, num_partitions=num_partitions
    )
