"""Per-group analytic (window) functions, pivot, and distinct counts.

Reference parity: the reference computes per-trace ordered facts (previous /
next span, running counters) inside its graph walks
(hypertrace-trace-enricher/.../util/ApiTraceGraph.java:139-273) and builds
per-key distinct sets in view generators
(hypertrace-view-generator/.../RawTraceViewGenerator.java — distinct services
per trace).  Here the same semantics are generic, reusable operators:

- :func:`window_functions` — lag / lead / cumulative-sum / row_number over
  key-groups ordered by a column, vectorized with the segmented kernels from
  ``stages/grouping.py`` (one hash exchange, zero Python loops over rows).
- :func:`pivot_counts` — long→wide conditional counting (partial per-batch
  combine, then one small exchange on the row key).
- :func:`distinct_count` — exact COUNT(DISTINCT value) per key with batch-side
  pre-dedup so only unique (key, value) pairs cross the shuffle.

Scale notes: every operator pre-aggregates inside ``map_batches`` before its
single hash exchange; the exchange payload is the projection of the needed
columns only.  Skewed keys in ``window_functions`` land a whole key-group on
one partition (same constraint as any per-group ordered walk) — cap group
size upstream (grouping.py max-turns guard) if a key can be pathological.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from .grouping import (
    DEFAULT_NUM_PARTITIONS,
    group_apply,
    run_boundaries,
    segmented_sum,
)

__all__ = ["window_functions", "pivot_counts", "distinct_count"]


def _np_cols(part: pa.Table, cols: Sequence[str]):
    return [part[c].to_numpy(zero_copy_only=False) for c in cols]


def window_functions(
    ds: Dataset,
    *,
    key: Union[str, Sequence[str]],
    order_col: str,
    lag: Optional[Dict[str, str]] = None,
    lead: Optional[Dict[str, str]] = None,
    cumsum: Optional[Dict[str, str]] = None,
    row_number: Optional[str] = None,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> Dataset:
    """SQL window functions over ``PARTITION BY key ORDER BY order_col``.

    ``lag`` / ``lead`` map output-column → source-column (offset 1, NULL at
    group edges); ``cumsum`` maps output → source (inclusive running sum,
    NULLs treated as 0 like SQL ``SUM OVER``); ``row_number`` names a 1-based
    rank column.  All original columns are preserved.
    """
    keys = [key] if isinstance(key, str) else list(key)
    lag = dict(lag or {})
    lead = dict(lead or {})
    cumsum = dict(cumsum or {})

    def _apply(part: pa.Table) -> pa.Table:
        n = part.num_rows
        if n == 0:
            return part
        bounds = run_boundaries(*_np_cols(part, keys))
        starts = np.zeros(n, dtype=bool)
        starts[bounds[:-1]] = True
        ends = np.zeros(n, dtype=bool)
        ends[bounds[1:] - 1] = True
        idx = np.arange(n, dtype=np.int64)
        out = part
        if lag:
            take_prev = pa.array(np.maximum(idx - 1, 0))
            mask = pa.array(starts)
            for out_name, src in lag.items():
                arr = part[src].combine_chunks()
                out = out.append_column(
                    out_name,
                    pc.if_else(mask, pa.scalar(None, arr.type), arr.take(take_prev)),
                )
        if lead:
            take_next = pa.array(np.minimum(idx + 1, n - 1))
            mask = pa.array(ends)
            for out_name, src in lead.items():
                arr = part[src].combine_chunks()
                out = out.append_column(
                    out_name,
                    pc.if_else(mask, pa.scalar(None, arr.type), arr.take(take_next)),
                )
        for out_name, src in cumsum.items():
            v = part[src].to_numpy(zero_copy_only=False)
            v = np.where(np.asarray(pc.is_null(part[src])), 0, v).astype(np.int64)
            c = np.cumsum(v)
            base = np.repeat(
                np.concatenate(([0], c[bounds[1:-1] - 1])), np.diff(bounds)
            )
            out = out.append_column(out_name, pa.array(c - base))
        if row_number:
            seg_start = np.repeat(bounds[:-1], np.diff(bounds))
            out = out.append_column(row_number, pa.array(idx - seg_start + 1))
        return out

    return group_apply(
        ds, keys, _apply, sort_by=[order_col], num_partitions=num_partitions
    )


def pivot_counts(
    ds: Dataset,
    *,
    row_key: str,
    col_key: str,
    categories: Sequence[str],
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> Dataset:
    """Long→wide conditional count: one output row per ``row_key`` with one
    ``<category>_cnt`` int64 column per category (rows whose ``col_key`` is
    outside ``categories`` are ignored).

    Partial combine runs per batch (so the exchange moves one row per
    (row_key, batch), not per input row) followed by one hash exchange.
    """
    categories = list(categories)
    cnt_cols = [f"{c}_cnt" for c in categories]

    def _partial(batch: pa.Table) -> pa.Table:
        ck = batch[col_key]
        cols = {row_key: batch[row_key]}
        for cat, out_name in zip(categories, cnt_cols):
            cols[out_name] = pc.cast(pc.equal(ck, cat), pa.int64())
        tmp = pa.table(cols)
        agg = tmp.group_by([row_key]).aggregate(
            [(c, "sum") for c in cnt_cols]
        )
        return agg.rename_columns([row_key] + cnt_cols)

    def _final(part: pa.Table) -> pa.Table:
        bounds = run_boundaries(*_np_cols(part, [row_key]))
        firsts = bounds[:-1]
        out = {row_key: part[row_key].take(pa.array(firsts))}
        for c in cnt_cols:
            sums = segmented_sum(
                part[c].to_numpy(zero_copy_only=False).astype(np.int64), bounds
            )
            out[c] = pa.array(np.asarray(sums, dtype=np.int64))
        return pa.table(out)

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    return group_apply(partials, row_key, _final, num_partitions=num_partitions)


def distinct_count(
    ds: Dataset,
    *,
    key: Union[str, Sequence[str]],
    value_col: str,
    out_col: str = "n_distinct",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> Dataset:
    """Exact ``COUNT(DISTINCT value_col)`` per key (NULL values ignored,
    matching SQL).

    Batch-side pre-dedup (pyarrow ``group_by`` with no aggregates) means only
    unique (key, value) pairs leave each read task; the single hash exchange
    then counts value-runs inside key-runs with two ``searchsorted`` calls —
    no per-group Python loop, no second shuffle.  For approximate counting at
    much lower shuffle cost see ``stages/sketches.hll_distinct``.
    """
    keys = [key] if isinstance(key, str) else list(key)

    def _local_unique(batch: pa.Table) -> pa.Table:
        batch = batch.select(keys + [value_col])
        if batch[value_col].null_count:
            batch = batch.filter(pc.is_valid(batch[value_col]))
        return batch.group_by(keys + [value_col]).aggregate([])

    def _count(part: pa.Table) -> pa.Table:
        key_arrays = _np_cols(part, keys)
        kb = run_boundaries(*key_arrays)
        kvb = run_boundaries(*key_arrays, part[value_col].to_numpy(zero_copy_only=False))
        kv_starts = kvb[:-1]
        counts = np.searchsorted(kv_starts, kb[1:], side="left") - np.searchsorted(
            kv_starts, kb[:-1], side="left"
        )
        firsts = pa.array(kb[:-1])
        out = {k: part[k].take(firsts) for k in keys}
        out[out_col] = pa.array(counts.astype(np.int64))
        return pa.table(out)

    uniques = ds.map_batches(_local_unique, batch_format="pyarrow")
    return group_apply(
        uniques, keys, _count, sort_by=[value_col], num_partitions=num_partitions
    )
