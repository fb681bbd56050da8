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
from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .grouping import run_boundaries
from .normalize import DropCondition, rules_mask


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
        tenants = batch["tenant_id"].to_numpy(zero_copy_only=False)
        keys = batch[self.key_col].to_numpy(zero_copy_only=False)
        keep = np.ones(batch.num_rows, dtype=bool)
        counts = self._counts
        for i, k in enumerate(zip(tenants, keys)):
            c = counts.get(k, 0)
            if c >= self.max_rows:
                keep[i] = False
            else:
                counts[k] = c + 1
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
