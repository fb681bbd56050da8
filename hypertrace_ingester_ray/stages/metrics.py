"""Stage 5 — windowed metric aggregation (the metrics-generator analog).

Reference: MetricsProcessor groups RawServiceView rows by a metric identity
(timestamp truncated to the aggregation window + uuid of {tenant, service,
api, protocol, status}) and keeps a running sum(num_calls) in a KV store,
emitting OTLP gauges after a wait punctuator
(/root/reference/hypertrace-metrics-generator/.../MetricsProcessor.java:75-136,
MetricEmitPunctuator.java:57-115).

Batch translation: a two-level aggregation — a *partial* per-batch Arrow
group-by inside ``map_batches`` (the combiner, so the shuffle moves one row
per (window, dims) per batch instead of one per turn), then the small global
``ds.groupby(dims).sum()``.
"""

from __future__ import annotations

from typing import List

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

METRIC_DIMS: List[str] = ["window_ts", "tenant_id", "service_name", "api_status"]


def partial_counts(batch: pa.Table, window: str = "minute") -> pa.Table:
    """Per-batch combiner: truncate ts to the window, count turns per dims."""
    window_ts = pc.floor_temporal(batch["ts"], unit=window)
    t = pa.table(
        {
            "window_ts": window_ts,
            "tenant_id": batch["tenant_id"],
            "service_name": batch["service_name"],
            "api_status": batch["api_status"],
        }
    )
    out = t.group_by(METRIC_DIMS).aggregate([([], "count_all")])
    return out.rename_columns(METRIC_DIMS + ["num_calls"])


def finalize_partials(partials: "pa.Table") -> "pa.Table":
    """Final combine of per-partition partial counts (small by construction:
    ≤ distinct dims × partitions rows)."""
    out = partials.group_by(METRIC_DIMS).aggregate([("num_calls", "sum")])
    return out.rename_columns(METRIC_DIMS + ["num_calls"])


def windowed_metrics(per_turn: Dataset, window: str = "minute") -> Dataset:
    """turns → (window_ts, tenant, service, api_status, num_calls)."""
    partial = per_turn.map_batches(
        partial_counts, batch_format="pyarrow", fn_kwargs={"window": window}
    )
    agg = partial.groupby(METRIC_DIMS).sum("num_calls")

    def _rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(METRIC_DIMS + ["num_calls"])

    return agg.map_batches(_rename, batch_format="pyarrow")
