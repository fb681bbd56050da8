"""The flagship end-to-end pipeline: parse → group → enrich → route → aggregate.

Topology analog of HypertraceIngester's merged job chain
(/root/reference/hypertrace-ingester/src/main/java/org/hypertrace/ingester/
HypertraceIngester.java:52-77), where consecutive jobs share in-memory streams
instead of Kafka round-trips (SpanNormalizer.java:55-61).  Here the whole
chain is ONE lazy Ray Data pipeline with exactly one all-to-all shuffle:

  read_parquet(transcripts)
    → map_batches(normalize)                       # span-normalizer
    → group_apply(conv_id, PartitionProcessor)     # grouper + enricher + view-gen
         ├─ assemble (order/dedup/cap/sessionize)
         ├─ enricher DAG (topo order, vectorized)
         └─ 6 view sinks written atomically per partition (+ manifest)
    → stats rows (small)                           # lineage + metrics
  read(per_turn sink) → windowed_metrics → metrics sink   # metrics-generator

The metrics stage consumes the per_turn sink exactly as the reference's
metrics pipeline consumes the RawServiceView Kafka topic
(hypertrace-metrics-generator/.../MetricsProcessor.java:75-124).

Every sink is partitioned Parquet (one file per hash partition) with a JSON
manifest per partition — a killed run resumes by skipping committed
partitions (state/lineage.py), producing no duplicate or missing routed rows.
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Dict, Optional, Union

import pyarrow as pa

import ray
import ray.data
from ray.data import Dataset

from .. import schemas
from ..enrichers import build_default_registry
from ..enrichers.base import ConversationContext
from ..sources.transcripts import read_transcripts
from ..stages.grouping import (
    DEFAULT_NUM_PARTITIONS,
    assemble_conversations,
    group_apply,
)
from ..stages.metrics import windowed_metrics
from ..stages.normalize import NormalizeConfig, normalize, split_bypass
from ..stages.views import VIEW_BUILDERS
from ..state import lineage


@dataclass
class PipelineConfig:
    normalize: NormalizeConfig = field(default_factory=NormalizeConfig)
    max_turns_per_conv: int = 100_000
    session_gap_us: Optional[int] = None
    num_partitions: int = DEFAULT_NUM_PARTITIONS
    # actor-pool size for the partition stage; tuple = autoscaling (min, max)
    concurrency: Union[int, tuple, None] = None
    service_registry: Optional[Dict[str, str]] = None
    metrics_window: str = "minute"


def process_partition(
    table: pa.Table,
    *,
    registry,
    max_turns_per_conv: int = 100_000,
    session_gap_us: Optional[int] = None,
):
    """Pure core: normalized partition (sorted by conv_id, turn_idx, ts) →
    (views dict, stats dict).  Shared by the sink-writing actor and tests."""
    rows_in = table.num_rows
    assembled, n_dedup, n_capped = assemble_conversations(
        table,
        max_turns_per_conv=max_turns_per_conv,
        session_gap_us=session_gap_us,
    )
    enriched = registry.apply(assembled)
    ctx = ConversationContext(enriched)
    views = {name: builder(enriched, ctx) for name, builder in VIEW_BUILDERS.items()}
    stats = {
        "rows_in": rows_in,
        "rows_deduped": n_dedup,
        "rows_capped": n_capped,
        "view_counts": {k: v.num_rows for k, v in views.items()},
    }
    return views, stats


class PartitionProcessor:
    """Actor-pool partition stage: grouper + enricher + view fan-out + sinks.

    Built once per worker (enricher DAG, lookup registries) — the analog of
    the process-wide singleton EnrichmentProcessor
    (StructuredTraceEnrichProcessor.java:38-61).
    """

    STATS_SCHEMA = pa.schema(
        [
            pa.field("part_id", pa.int32()),
            pa.field("rows_in", pa.int64()),
            pa.field("rows_deduped", pa.int64()),
            pa.field("rows_capped", pa.int64()),
            pa.field("resumed", pa.bool_()),
        ]
        + [pa.field(f"rows_{v}", pa.int64()) for v in VIEW_BUILDERS]
    )

    def __init__(
        self,
        out_dir: str,
        max_turns_per_conv: int = 100_000,
        session_gap_us: Optional[int] = None,
        service_registry: Optional[Dict[str, str]] = None,
    ):
        self.out_dir = out_dir
        self.max_turns_per_conv = max_turns_per_conv
        self.session_gap_us = session_gap_us
        self.registry = build_default_registry(service_registry)

    def _stats_row(self, part_id, stats, resumed):
        row = {
            "part_id": [part_id],
            "rows_in": [stats["rows_in"]],
            "rows_deduped": [stats["rows_deduped"]],
            "rows_capped": [stats["rows_capped"]],
            "resumed": [resumed],
        }
        for v in VIEW_BUILDERS:
            row[f"rows_{v}"] = [stats["view_counts"].get(v, 0)]
        return pa.Table.from_pydict(row, schema=self.STATS_SCHEMA)

    def __call__(self, part: pa.Table, part_id: int) -> pa.Table:
        existing = lineage.load_manifest(self.out_dir, part_id)
        if existing is not None:
            return self._stats_row(part_id, existing, resumed=True)

        views, stats = process_partition(
            part,
            registry=self.registry,
            max_turns_per_conv=self.max_turns_per_conv,
            session_gap_us=self.session_gap_us,
        )
        for name, tbl in views.items():
            lineage.write_view_part(self.out_dir, name, part_id, tbl)
        lineage.commit_manifest(
            self.out_dir,
            part_id,
            rows_in=stats["rows_in"],
            rows_deduped=stats["rows_deduped"],
            rows_capped=stats["rows_capped"],
            view_counts=stats["view_counts"],
        )
        return self._stats_row(part_id, stats, resumed=False)


def run_pipeline(
    input_path_or_ds: Union[str, Dataset],
    out_dir: str,
    config: Optional[PipelineConfig] = None,
) -> dict:
    """Execute the full topology; returns the run summary (also written as
    ``_run_manifest.json``)."""
    config = config or PipelineConfig()
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.perf_counter()
    ds = (
        input_path_or_ds
        if isinstance(input_path_or_ds, Dataset)
        else read_transcripts(input_path_or_ds)
    )

    ds = normalize(ds, config.normalize)
    main, bypass = split_bypass(ds, config.normalize)

    concurrency = config.concurrency
    if concurrency is None:
        # callable-class map_groups needs an explicit actor-pool size; leave
        # headroom for the shuffle's map/reduce tasks (a pool sized to the
        # whole cluster starves the sort and deadlocks)
        total_cpus = int(ray.cluster_resources().get("CPU", 4))
        concurrency = max(1, total_cpus // 2)
    kwargs = {"concurrency": concurrency}
    stats_ds = group_apply(
        main,
        "conv_id",
        fn_class=PartitionProcessor,
        fn_constructor_kwargs={
            "out_dir": out_dir,
            "max_turns_per_conv": config.max_turns_per_conv,
            "session_gap_us": config.session_gap_us,
            "service_registry": config.service_registry,
        },
        pass_part_id=True,
        sort_by=["turn_idx", "ts"],
        num_partitions=config.num_partitions,
        **kwargs,
    )
    stats = stats_ds.to_pandas()  # one row per partition — small by design
    if stats.empty:  # every row dropped/filtered upstream
        stats = (
            PartitionProcessor.STATS_SCHEMA.empty_table().to_pandas()
        )

    # bypass side output (SpanNormalizer.java:66-70 routed branch)
    if bypass is not None:
        bp_dir = os.path.join(out_dir, "bypass")
        if not os.path.exists(bp_dir):
            tmp = bp_dir + "_tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            bypass.write_parquet(tmp)
            os.rename(tmp, bp_dir)

    # metrics stage reads the per_turn sink (as the reference's metrics
    # pipeline consumes the view topic)
    metrics_dir = os.path.join(out_dir, "metrics")
    per_turn_dir = os.path.join(out_dir, "per_turn")
    if not os.path.exists(metrics_dir) and os.path.exists(per_turn_dir):
        per_turn = ray.data.read_parquet(
            per_turn_dir,
            columns=["ts", "tenant_id", "service_name", "api_status"],
        )
        tmp = metrics_dir + "_tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        windowed_metrics(per_turn, config.metrics_window).write_parquet(tmp)
        os.rename(tmp, metrics_dir)

    elapsed = time.perf_counter() - t0
    total_rows_in = int(stats["rows_in"].sum())
    summary = {
        "elapsed_sec": elapsed,
        "num_partitions": len(stats),
        "resumed_partitions": int(stats["resumed"].sum()),
        "rows_in": total_rows_in,
        "rows_deduped": int(stats["rows_deduped"].sum()),
        "rows_capped": int(stats["rows_capped"].sum()),
        "view_counts": {
            v: int(stats[f"rows_{v}"].sum()) for v in VIEW_BUILDERS
        },
        "turns_per_sec": total_rows_in / elapsed if elapsed > 0 else 0.0,
    }
    lineage.write_run_manifest(out_dir, summary)
    return summary


def view_dataset(out_dir: str, view: str) -> Dataset:
    """Read a routed sink back as a Dataset."""
    return ray.data.read_parquet(os.path.join(out_dir, view))
