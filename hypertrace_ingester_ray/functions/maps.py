"""Operations over open-ended attribute map columns (map<string,string>).

The reference carries arbitrary span tags in ``Event.attributes`` and filters
them by prefix allow/deny lists — ``TagsFilter``: keep a key unless it
matches an ``allowed.attributes.prefixes`` entry and is not in the explicit
allow-list (/root/reference/span-normalizer/span-normalizer/src/main/java/
org/hypertrace/core/spannormalizer/jaeger/TagsFilter.java:65-100).  Keys are
lower-cased at ingest (EventBuilder.java:73-83).

The flagship transcript schema keeps extracted fields as narrow first-class
columns (SURVEY.md §7.5), so these operators serve pipelines that do carry a
map column.  All are vectorized over the flattened keys/items arrays — no
per-row Python.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def lowercase_map_keys(col: pa.ChunkedArray) -> pa.Array:
    """Lower-case every key (EventBuilder.java:73-83 ingest normalization)."""
    arr = col.combine_chunks()
    keys = pc.utf8_lower(arr.keys)
    return pa.MapArray.from_arrays(arr.offsets, keys, arr.items)


def filter_map_keys(
    col: pa.ChunkedArray,
    *,
    denied_prefixes: Sequence[str] = (),
    allow_list: Sequence[str] = (),
) -> pa.Array:
    """TagsFilter semantics (TagsFilter.java:65-100): drop an entry when its
    key starts with any denied prefix, unless the key is explicitly allowed.
    """
    arr = col.combine_chunks()
    keys = arr.keys
    keep = np.ones(len(keys), dtype=bool)
    for prefix in denied_prefixes:
        hit = pc.starts_with(keys, prefix).to_numpy(zero_copy_only=False)
        keep &= ~hit
    if allow_list:
        allowed = pc.is_in(keys, value_set=pa.array(list(allow_list))).to_numpy(
            zero_copy_only=False
        )
        keep |= allowed

    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    # new offsets = cumulative count of kept entries at each old offset
    kept_cum = np.concatenate(([0], np.cumsum(keep.astype(np.int64))))
    new_offsets = pa.array(kept_cum[offsets].astype(np.int32))
    idx = pa.array(np.flatnonzero(keep))
    return pa.MapArray.from_arrays(new_offsets, keys.take(idx), arr.items.take(idx))


def map_get(col: pa.ChunkedArray, key: str) -> pa.Array:
    """Vectorized ``attributes[key]`` extraction (first match per row)."""
    arr = col.combine_chunks()
    keys = arr.keys
    hit = pc.equal(keys, key).to_numpy(zero_copy_only=False)
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    n = len(arr)
    out_idx = np.full(n, -1, dtype=np.int64)
    hit_pos = np.flatnonzero(hit)
    if len(hit_pos):
        # row of each hit = searchsorted into offsets; keep FIRST hit per row
        rows = np.searchsorted(offsets, hit_pos, side="right") - 1
        first = np.unique(rows, return_index=True)[1]
        out_idx[rows[first]] = hit_pos[first]
    matched = out_idx >= 0
    values = arr.items.take(pa.array(np.where(matched, out_idx, 0)))
    return pc.if_else(pa.array(matched), values, pa.nulls(n, arr.items.type))
