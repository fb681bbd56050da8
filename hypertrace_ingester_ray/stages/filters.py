"""Stateful / group-scoped filters beyond the vectorized drop rules.

- RateLimiter — F5 ``RateLimitingSpanFilter`` analog
  (/root/reference/span-normalizer/.../jaeger/RateLimitingSpanFilter.java:34-57):
  per (tenant, group-key) max-rows-per-window counter.  The reference keeps
  the counter per stream thread, i.e. the limit is approximate across
  threads; here the counter is per worker process, the same approximation.
- root_exit_drop — F3 root-exit-span drop (SpanFilter.java:180-191):
  conversations whose FIRST turn is an EXIT (tool) turn are suspect
  (parentless client span); the leading exit turns are dropped unless an
  exclusion rule matches.
- latency_sample — G5 ``TraceLatencyMeter`` analog (utils/TraceLatencyMeter.java):
  deterministic hash-based sampling flag (hash(conv_id) % 100 < pct), so the
  sample is stable across runs/retries rather than RNG-dependent.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .grouping import run_boundaries, segment_ids_from_boundaries, segmented_cumcount
from .normalize import DropCondition, rules_mask


@dataclass(frozen=True)
class RateLimitConfig:
    """Production rate-limit knob (F5) — the SpanDropManager composition of
    RateLimitingSpanFilter (SpanDropManager.java composes it;
    RateLimitingSpanFilter.java:34-57 counts per (tenant, groupingKey) per
    wall-clock minute).

    The batch engine's window is DATA time, not wall clock: wall-clock
    admission would make resumed runs emit different rows than the original
    (breaking the north rule's no-dup/no-missing resume contract), so the
    production pipeline caps rows per (conversation, ts-window) in stable
    (turn_idx, ts) order — exact and deterministic, where the reference's
    per-stream-thread counter is approximate across threads."""

    max_rows_per_window: int
    window_sec: float = 60.0


def rate_limit_part(
    part: pa.Table,
    *,
    max_rows_per_window: int,
    window_us: int,
    key_col: str = "conv_id",
) -> tuple:
    """Deterministic per-(key, ts-window) cap over one sorted partition:
    keeps the FIRST ``max_rows_per_window`` rows of each window in the
    partition's (key, turn) order.  Fully vectorized (one stable lexsort +
    segmented cumcount, no row loop).  Returns ``(table, n_dropped)``."""
    if part.num_rows == 0 or max_rows_per_window <= 0:
        return part, 0
    keys = (
        part[key_col]
        .combine_chunks()
        .dictionary_encode()
        .indices.to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    ts = part["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    wcode = ts // np.int64(max(window_us, 1))
    # stable sort by (key, window): equal cells keep partition order, so the
    # cumcount below is 'arrival order within the window'
    order = np.lexsort((wcode, keys))
    bounds = run_boundaries(keys[order], wcode[order])
    pos = segmented_cumcount(segment_ids_from_boundaries(bounds))
    keep = np.empty(len(keys), dtype=bool)
    keep[order] = pos < max_rows_per_window
    if keep.all():
        return part, 0
    return part.filter(pa.array(keep)), int((~keep).sum())


class RateLimiter:
    """Per-(tenant, key) rows-per-window limiter; callable class for
    ``map_batches(RateLimiter, fn_constructor_kwargs=..., concurrency=N)``.

    State is worker-local (as the reference's is thread-local), so the
    effective global limit is ≈ limit × workers.
    """

    def __init__(
        self,
        max_rows_per_window: int,
        key_col: str = "conv_id",
        window_sec: float = 60.0,
        clock=time.monotonic,
    ):
        self.max_rows = max_rows_per_window
        self.key_col = key_col
        self.window_sec = window_sec
        self.clock = clock
        self._counts: dict = {}
        self._window_start = clock()

    def __call__(self, batch: pa.Table) -> pa.Table:
        now = self.clock()
        if now - self._window_start >= self.window_sec:
            self._counts.clear()
            self._window_start = now
        tenants = np.asarray(batch["tenant_id"].to_pandas(), dtype=object)
        keys = np.asarray(batch[self.key_col].to_pandas(), dtype=object)
        # vectorized per-(tenant, key) cumcount in batch order; the Python
        # dict is touched once per DISTINCT pair, not per row.
        # dropna=False: a null tenant/key is a real group (M2 tenant_column
        # can yield null tenants upstream of the drop) — pandas' default
        # dropna=True emits ngroup()==-1 / cumcount NaN for those rows,
        # which mis-indexes prior[] and crashes np.bincount
        g = pd.DataFrame({"t": tenants, "k": keys}).groupby(
            ["t", "k"], sort=False, dropna=False
        )
        codes = g.ngroup().to_numpy()  # 0..G-1 in first-appearance order
        within = g.cumcount().to_numpy()
        first_pos = np.unique(codes, return_index=True)[1]
        counts = self._counts
        prior = np.array(
            [counts.get((tenants[i], keys[i]), 0) for i in first_pos],
            dtype=np.int64,
        )
        keep = (within + prior[codes]) < self.max_rows
        admitted = np.bincount(
            codes, weights=keep, minlength=len(first_pos)
        ).astype(np.int64)
        for j, i in enumerate(first_pos):
            counts[(tenants[i], keys[i])] = int(prior[j] + admitted[j])
        if keep.all():
            return batch
        return batch.filter(pa.array(keep))


def root_exit_drop(
    part: pa.Table,
    exclusion_rules: Sequence[Sequence[DropCondition]] = (),
) -> pa.Table:
    """Drop leading EXIT (tool) turns of each conversation — the parentless
    client-span drop (SpanFilter.java:180-191) with XOR-style exclusion
    (lines 141-153): a leading exit turn matching an exclusion rule is kept.

    Expects ``part`` sorted by (conv_id, turn_idx).
    """
    if part.num_rows == 0:
        return part
    conv = part["conv_id"].combine_chunks().dictionary_encode()
    codes = conv.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    roles = np.asarray(part["role"].to_pandas(), dtype=object)
    bounds = run_boundaries(codes)

    is_exit = roles == "tool"
    # a row is a leading exit iff no non-exit row has appeared yet in its
    # conversation: per-segment cumulative count of non-exits == 0
    inv = (~is_exit).astype(np.int64)
    cum = np.cumsum(inv)
    seg_start_cum = np.repeat(cum[bounds[:-1]] - inv[bounds[:-1]], np.diff(bounds))
    lead = (cum - seg_start_cum) == 0  # no non-exit seen yet in this conv

    if exclusion_rules:
        excl = rules_mask(part, exclusion_rules)
        if excl is not None:
            lead &= ~excl.combine_chunks().to_numpy(zero_copy_only=False)
    if not lead.any():
        return part
    return part.filter(pa.array(~lead))


def latency_sample_mask(batch: pa.Table, pct: int, key_col: str = "conv_id") -> pa.Array:
    """Deterministic sampling flag: hash(key) % 100 < pct."""
    h = pd.util.hash_array(
        np.asarray(batch[key_col].to_pandas(), dtype=object), categorize=False
    )
    return pa.array((h % np.uint64(100)) < np.uint64(pct))


def add_latency_sample(batch: pa.Table, pct: int = 10) -> pa.Table:
    return batch.append_column("latency_sampled", latency_sample_mask(batch, pct))
