"""Vectorized text-hash kernels shared by dedup and fingerprinting.

The hot path of the LLM-data operators (MinHash, SimHash, fingerprints) is
"split every doc into word n-grams and hash each n-gram".  Doing that with a
per-doc / per-shingle Python loop is the exact anti-pattern this engine bans,
so the whole batch is processed as flat arrays instead:

1. ``pc.split_pattern`` tokenizes every document in one Arrow kernel call;
   the result is a flat token array plus per-doc offsets.
2. Every token is hashed in one vectorized pass (pandas' C SipHash over the
   flat array — no Python-level loop).
3. An n-gram (shingle) hash is a rolling polynomial combine of ``k``
   consecutive token hashes: ``k`` shifted-slice numpy ops over the flat
   array, independent of document count.
4. Per-document reductions (min for MinHash/fingerprints, bit votes for
   SimHash) use ``np.minimum.reduceat`` / ``np.add.reduceat`` over the
   per-doc segment offsets.

Documents with fewer than ``k`` tokens fall back to a single shingle equal to
the hash of the whole text (mirrors the scalar fallback the round-1 kernels
used), so every document always has >= 1 shingle and ``reduceat`` segments
are never empty.

Reference parity note: the reference has no vectorized analog — its span
normalization hashes one record at a time on the JVM; these kernels are the
Ray-Data-native batch equivalent.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# FNV-1a prime as the rolling-combine multiplier; any odd 64-bit constant
# works — products wrap mod 2^64, which is the hash domain.
_ROLL_C = np.uint64(0x100000001B3)


def _as_array(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def poly_hash_strings(texts) -> np.ndarray:
    """Polynomial byte hash per string: fold ``h = h*C + byte`` mod 2^64.

    The SQL-expressible scheme, used by the oracle-checkable
    ``scheme="poly"`` variants of the shingle kernels.  **Mirror contract**:
    the DuckDB mirror folds ``ord(substr(s, j, 1))`` — Unicode CODEPOINTS —
    while this kernel folds UTF-8 BYTES (the vectorizable form), so the two
    agree byte-for-byte on ASCII text (one byte == one codepoint) and
    diverge on non-ASCII.  The synthetic corpora are ASCII by construction;
    a non-ASCII corpus should run the poly-scheme operators as rows-only
    (or use ``scheme="siphash"``), exactly like the winnow oracle, which
    shares this contract.

    Vectorized without length-skew pathology: strings are processed
    longest-first so iteration ``j`` touches a shrinking PREFIX of the
    sorted arrays — total work is O(total bytes) + one argsort, not
    O(n_strings × max_len) (a single 1 MB doc among 100k short ones would
    otherwise cost ~10^11 mask operations).  Nulls and empty strings hash
    to 0 (the fold's seed).
    """
    arr = _as_array(texts)
    b = arr.cast(pa.large_binary())
    n = len(b)
    if n == 0:
        return np.empty(0, np.uint64)
    o = np.frombuffer(
        b.buffers()[1], dtype=np.int64, count=n + 1, offset=b.offset * 8
    )
    buf = b.buffers()[2]
    data = (
        np.frombuffer(buf, dtype=np.uint8)[o[0] : o[-1]]
        if buf is not None
        else np.empty(0, np.uint8)
    )
    off = o - o[0]
    starts = off[:-1]
    lens = np.diff(off)
    max_len = int(lens.max())
    if max_len == 0:
        return np.zeros(n, dtype=np.uint64)
    order = np.argsort(-lens, kind="stable")  # longest first
    s_starts = starts[order]
    s_lens = lens[order]
    # active[j] = how many strings have len > j — a prefix of the sorted
    # order, computed from one length histogram
    hist = np.bincount(s_lens, minlength=max_len + 1)
    active = n - np.cumsum(hist)  # active[j] counts lens > j
    s_acc = np.zeros(n, dtype=np.uint64)
    j = 0
    while j < max_len:
        a = int(active[j])
        if a == 0:
            break
        if a <= 32:
            # tail: few very long strings left — finish each with ONE
            # vectorized Horner pass over its remaining bytes (wrapping
            # uint64 cumprod gives the C-power ladder mod 2^64) instead of
            # max_len-j more 1-element loop iterations
            with np.errstate(over="ignore"):  # wrap mod 2^64 is the domain
                for i in range(a):
                    rest = data[
                        s_starts[i] + j : s_starts[i] + s_lens[i]
                    ].astype(np.uint64)
                    m = len(rest)
                    ladder = np.full(m, _ROLL_C, dtype=np.uint64)
                    ladder[0] = 1
                    ladder = np.cumprod(ladder, dtype=np.uint64)  # C^i
                    top = ladder[-1] * _ROLL_C  # C^m
                    # h' = h*C^m + sum rest[i] * C^(m-1-i)  (mod 2^64)
                    s_acc[i] = s_acc[i] * top + (
                        rest * ladder[::-1]
                    ).sum(dtype=np.uint64)
            break
        s_acc[:a] = s_acc[:a] * _ROLL_C + data[s_starts[:a] + j]
        j += 1
    acc = np.empty(n, dtype=np.uint64)
    acc[order] = s_acc
    return acc


def token_hashes(
    texts, *, scheme: str = "siphash"
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Split on spaces and hash every token of every doc, vectorized.

    Returns ``(tok_h, off, text_h)``: flat uint64 token hashes, int64
    per-doc offsets into ``tok_h`` (len = n_docs + 1), and a uint64 whole-text
    hash per doc (used as the short-doc fallback shingle).

    ``scheme="siphash"`` (default) is pandas' keyed SipHash — best dispersion,
    not expressible in SQL.  ``scheme="poly"`` is the polynomial byte fold of
    :func:`poly_hash_strings` — weaker but DuckDB-mirrorable, so operators
    run with it can be value-checked end-to-end against a SQL oracle.
    """
    arr = _as_array(texts)
    toks = _as_array(pc.split_pattern(arr, " "))
    flat = toks.flatten()
    off = np.asarray(toks.offsets, dtype=np.int64)
    off = off - off[0]  # flatten() already rebased values; rebase offsets too
    if len(flat):
        # hash via Arrow dictionary_encode: the C++ kernel finds the unique
        # tokens, only THOSE become Python objects for hash_array, and the
        # flat hash array is a vectorized take — same values as hashing the
        # flat array directly, but Python-object work drops from
        # O(total tokens) to O(vocabulary), a ~30x win on repetitive
        # corpora (exactly the dedup-workload shape)
        enc = flat.dictionary_encode()
        if scheme == "poly":
            uniq_h = poly_hash_strings(enc.dictionary)
        else:
            uniq_h = pd.util.hash_array(
                enc.dictionary.to_numpy(zero_copy_only=False), categorize=False
            ).astype(np.uint64)
        tok_h = uniq_h[enc.indices.to_numpy(zero_copy_only=False)]
    else:
        tok_h = np.empty(0, dtype=np.uint64)
    if len(arr):
        if scheme == "poly":
            text_h = poly_hash_strings(arr)
        else:
            text_h = pd.util.hash_array(
                arr.to_numpy(zero_copy_only=False), categorize=False
            ).astype(np.uint64)
    else:
        text_h = np.empty(0, dtype=np.uint64)
    return tok_h, off, text_h


def shingle_hashes(
    texts, k: int, *, scheme: str = "siphash"
) -> Tuple[np.ndarray, np.ndarray]:
    """Word-``k``-gram rolling hashes for a whole batch of texts.

    Returns ``(sh, soff)``: a flat uint64 array of shingle hashes grouped by
    document, and int64 offsets (len = n_docs + 1).  Every document has at
    least one shingle (short docs contribute their whole-text hash).
    """
    tok_h, off, text_h = token_hashes(texts, scheme=scheme)
    n = len(off) - 1
    total = len(tok_h)
    m = total - k + 1
    if n == 0:
        return np.empty(0, np.uint64), np.zeros(1, np.int64)

    if m > 0:
        # rolling polynomial over the flat token-hash array: k shifted slices
        acc = tok_h[:m].copy()
        for j in range(1, k):
            acc = acc * _ROLL_C + tok_h[j : j + m]
        # a window starting at flat position i belongs to doc d and is valid
        # iff it does not cross the doc boundary: i + k <= off[d+1]
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
        vdoc = doc_idx[:m]
        valid = (np.arange(m, dtype=np.int64) + k) <= off[vdoc + 1]
        sh_valid = acc[valid]
        vdoc = vdoc[valid]
        counts = np.bincount(vdoc, minlength=n).astype(np.int64)
    else:
        sh_valid = np.empty(0, np.uint64)
        counts = np.zeros(n, dtype=np.int64)

    fallback = counts == 0
    out_counts = np.where(fallback, 1, counts)
    soff = np.concatenate([[0], np.cumsum(out_counts)]).astype(np.int64)
    out = np.empty(soff[-1], dtype=np.uint64)
    slot_doc = np.repeat(np.arange(n, dtype=np.int64), out_counts)
    fb_slot = fallback[slot_doc]
    out[~fb_slot] = sh_valid  # real shingles, already in doc order
    out[fb_slot] = text_h[slot_doc[fb_slot]]
    return out, soff


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized population count of a uint64 array."""
    x = np.ascontiguousarray(x, dtype=np.uint64)
    if len(x) == 0:
        return np.empty(0, dtype=np.int64)
    return (
        np.unpackbits(x.view(np.uint8))
        .reshape(len(x), 8 * 8)
        .sum(axis=1)
        .astype(np.int64)
    )


def char_shingle_hashes(texts, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Byte-``k``-gram rolling hashes per doc, zero-copy over the Arrow
    value buffer.

    Returns ``(sh, soff)`` like :func:`shingle_hashes`: flat uint64 gram
    hashes grouped by doc + int64 offsets (len = n_docs + 1).  Unlike the
    word variant, docs shorter than ``k`` BYTES contribute NO grams (there
    is no whole-text fallback — substring detection has nothing to say
    about them).  Grams are polynomial rolling hashes of the raw UTF-8
    bytes; for ASCII text byte grams == character grams.
    """
    arr = _as_array(texts)
    b = arr.cast(pa.large_binary())
    n = len(b)
    if n == 0:
        return np.empty(0, np.uint64), np.zeros(1, np.int64)
    o = np.frombuffer(
        b.buffers()[1], dtype=np.int64, count=n + 1, offset=b.offset * 8
    )
    buf = b.buffers()[2]
    data = (
        np.frombuffer(buf, dtype=np.uint8)[o[0] : o[-1]]
        if buf is not None
        else np.empty(0, np.uint8)
    )
    off = o - o[0]
    m = len(data) - k + 1
    if m <= 0:
        return np.empty(0, np.uint64), np.zeros(n + 1, np.int64)
    acc = data[:m].astype(np.uint64)
    for j in range(1, k):
        acc = acc * _ROLL_C + data[j : j + m]
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
    vdoc = doc_idx[:m]
    valid = (np.arange(m, dtype=np.int64) + k) <= off[vdoc + 1]
    sh = acc[valid]
    vdoc = vdoc[valid]
    counts = np.bincount(vdoc, minlength=n).astype(np.int64)
    soff = np.concatenate(([0], np.cumsum(counts)))
    return sh, soff
