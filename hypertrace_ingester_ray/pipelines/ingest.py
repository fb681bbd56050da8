"""The flagship end-to-end pipeline: parse → group → enrich → route → aggregate.

Topology analog of HypertraceIngester's merged job chain
(/root/reference/hypertrace-ingester/src/main/java/org/hypertrace/ingester/
HypertraceIngester.java:52-77), where consecutive jobs share in-memory streams
instead of Kafka round-trips (SpanNormalizer.java:55-61).  Here the whole
chain is ONE lazy Ray Data pipeline with exactly one all-to-all shuffle:

  read_parquet(transcripts, ~2 blocks/CPU)
    → map_batches(normalize_light)                 # span-normalizer (narrow rows)
    → group_apply(conv_id, partition stage)        # grouper + enricher + view-gen
         ├─ grok extraction (post-shuffle)
         ├─ assemble (order/dedup/cap/sessionize)
         ├─ enricher DAG (topo order, vectorized)
         └─ 6 view sinks + metrics-partial combiner, written atomically
            per partition (+ manifest)
    → stats rows (1/partition)                     # lineage
  finalize_metrics: tiny combine over the partials # metrics-generator

The metrics aggregation mirrors the reference's metrics pipeline consuming
the RawServiceView topic (hypertrace-metrics-generator/.../
MetricsProcessor.java:75-124), expressed as a per-partition combiner plus a
final combine bounded by dims × partitions rows.

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
import pyarrow.compute as pc

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
from ..stages.filters import RateLimitConfig
from ..stages.normalize import NormalizeConfig, normalize, split_bypass
from ..stages.views import VIEW_BUILDERS
from ..state import lineage


@dataclass
class PipelineConfig:
    normalize: NormalizeConfig = field(default_factory=NormalizeConfig)
    max_turns_per_conv: int = 100_000
    session_gap_us: Optional[int] = None
    # MUST stay constant across resumes of the same out_dir (partition i of a
    # run always holds the same key-groups); guarded by _run_config.json
    num_partitions: int = DEFAULT_NUM_PARTITIONS
    # None (default) → stateless tasks with a per-worker-process cached
    # enricher registry: every CPU participates and there is no pool to size.
    # Set an int/tuple to use an actor pool instead (the right shape when
    # per-worker state is expensive to build — big models, large indexes);
    # then leave CPUs free for the shuffle or it deadlocks.
    concurrency: Union[int, tuple, None] = None
    # input read parallelism: ~2 blocks per CPU keeps per-task overhead low
    # while the shuffle stays balanced; None = derive from cluster CPUs
    read_num_blocks: Optional[int] = None
    # exchange strategy for the one shuffle: None (auto) picks the direct
    # two-stage hash exchange for the stateless path when num_partitions is
    # within DIRECT_SHUFFLE_MAX_PARTITIONS, else Ray Data's sort shuffle
    # (see stages/grouping.py:_direct_group_apply for the rationale)
    shuffle: Optional[str] = None
    service_registry: Optional[Dict[str, str]] = None
    metrics_window: str = "minute"
    # optional features (off by default, mirroring the reference's config
    # gating): see enrichers/extended.py and stages/filters.py
    enable_client_info: bool = False  # E11 client descriptor analog
    enable_user_agent: bool = False  # E11 full UA-grammar parse (6 fields)
    space_rules: tuple = ()  # E12 SpaceEnricher rules
    peer_correlation: bool = False  # G4/J2 two-pass broadcast KV join
    drop_root_exits: bool = False  # F3 parentless-client-span drop
    root_exit_exclusions: tuple = ()
    latency_sample_pct: Optional[int] = None  # G5 TraceLatencyMeter analog
    # F5 production rate limiting (SpanDropManager composes
    # RateLimitingSpanFilter.java:34-57): deterministic per-(conversation,
    # ts-window) row cap applied post-shuffle in stable turn order; dropped
    # rows counted as rows_rate_limited in the manifest.  None = off
    # (mirrors the reference default).
    rate_limit: Optional["RateLimitConfig"] = None


def process_partition(
    table: pa.Table,
    *,
    registry,
    max_turns_per_conv: int = 100_000,
    session_gap_us: Optional[int] = None,
    metrics_window: str = "minute",
    drop_root_exits: bool = False,
    root_exit_exclusions=(),
    latency_sample_pct: Optional[int] = None,
    tenant_id: Optional[str] = None,
    tenant_column: Optional[str] = None,
    rate_limit: Optional["RateLimitConfig"] = None,
):
    """Pure core: normalized partition (sorted by conv_id, turn_idx, ts) →
    (views dict, stats dict).  Shared by the sink-writing actor and tests.

    The views dict includes ``metrics_partial`` — the per-partition combiner
    of the windowed metric aggregation (A1).  The final combine over these
    partials is tiny (≤ dims × partitions rows), so the metrics stage never
    re-reads or re-shuffles the full per-turn data.
    """
    from ..stages.metrics import partial_counts
    from ..stages.normalize import DEFAULT_TENANT, extract_batch

    # no-op if extraction ran pre-shuffle; reconstructs the constant
    # tenant column the light path elided from the exchange
    table = extract_batch(table, tenant_id=tenant_id or DEFAULT_TENANT)
    rows_in = table.num_rows
    n_no_tenant = 0
    if tenant_column is not None and table.num_rows:
        # M2 column-derived tenant drop-if-absent (TenantIdHandler.java:
        # 33-81 drops records whose configured tenant tag is missing);
        # counted into the manifest as rows_no_tenant.  num_rows guard:
        # pc.all/pc.sum return null over an empty array
        valid = pc.is_valid(table["tenant_id"])
        if not pc.all(valid).as_py():
            n_no_tenant = table.num_rows - int(
                pc.sum(pc.cast(valid, pa.int64())).as_py()
            )
            table = table.filter(valid)
    n_rate_limited = 0
    if rate_limit is not None:
        from ..stages.filters import rate_limit_part

        # pre-grouping position mirrors SpanDropManager (rate-limited spans
        # never reach the grouper); the partition arrives in stable
        # (conv_id, turn_idx, ts) order so admission is deterministic
        table, n_rate_limited = rate_limit_part(
            table,
            max_rows_per_window=rate_limit.max_rows_per_window,
            window_us=int(rate_limit.window_sec * 1_000_000),
        )
    if drop_root_exits:
        from ..stages.filters import root_exit_drop

        table = root_exit_drop(table, root_exit_exclusions)
    if latency_sample_pct is not None:
        from ..stages.filters import add_latency_sample

        table = add_latency_sample(table, latency_sample_pct)
    assembled, n_dedup, n_capped = assemble_conversations(
        table,
        max_turns_per_conv=max_turns_per_conv,
        session_gap_us=session_gap_us,
    )
    enriched = registry.apply(assembled)
    ctx = ConversationContext(enriched)
    views = {name: builder(enriched, ctx) for name, builder in VIEW_BUILDERS.items()}
    views["metrics_partial"] = partial_counts(views["per_turn"], metrics_window)
    stats = {
        "rows_in": rows_in,
        "rows_deduped": n_dedup,
        "rows_capped": n_capped,
        "rows_no_tenant": n_no_tenant,
        "rows_rate_limited": n_rate_limited,
        "view_counts": {k: v.num_rows for k, v in views.items()},
    }
    return views, stats


# Per-worker-process processor cache (the process-wide singleton
# EnrichmentProcessor analog, StructuredTraceEnrichProcessor.java:38-61).
# Ray worker processes are reused across tasks, so the build cost is paid
# once per worker, exactly like an actor __init__ — without reserving CPUs.
_WORKER_PROCESSORS: Dict[str, "PartitionProcessor"] = {}


def _build_extras(config: "PipelineConfig", peer_index: Optional[Dict[str, str]]):
    extras = []
    if config.enable_client_info:
        from ..enrichers.extended import ClientInfoEnricher

        extras.append(ClientInfoEnricher())
    if config.enable_user_agent:
        from ..enrichers.extended import UserAgentEnricher

        extras.append(UserAgentEnricher())
    if config.space_rules:
        from ..enrichers.extended import SpaceEnricher

        extras.append(SpaceEnricher(config.space_rules))
    if peer_index is not None:
        from ..enrichers.extended import PeerServiceEnricher

        extras.append(PeerServiceEnricher(index=peer_index))
    return extras


class PartitionProcessor:
    """Partition stage: grouper + enricher + view fan-out + sinks.

    Used two ways (see PipelineConfig.concurrency): instantiated per worker
    process lazily by the stateless task path, or as an actor-pool callable
    class.  Either way the enricher DAG and lookup registries are built once
    per worker — the analog of the process-wide singleton EnrichmentProcessor
    (StructuredTraceEnrichProcessor.java:38-61).
    """

    STATS_SCHEMA = pa.schema(
        [
            pa.field("part_id", pa.int32()),
            pa.field("rows_in", pa.int64()),
            pa.field("rows_deduped", pa.int64()),
            pa.field("rows_capped", pa.int64()),
            pa.field("rows_no_tenant", pa.int64()),
            pa.field("rows_rate_limited", pa.int64()),
            pa.field("resumed", pa.bool_()),
        ]
        + [pa.field(f"rows_{v}", pa.int64()) for v in VIEW_BUILDERS]
    )

    def __init__(
        self,
        out_dir: str,
        config: Optional["PipelineConfig"] = None,
        peer_index: Optional[Dict[str, str]] = None,
    ):
        config = config or PipelineConfig()
        self.out_dir = out_dir
        self.config = config
        self.registry = build_default_registry(
            config.service_registry, _build_extras(config, peer_index)
        )

    def _stats_row(self, part_id, stats, resumed):
        row = {
            "part_id": [part_id],
            "rows_in": [stats["rows_in"]],
            "rows_deduped": [stats["rows_deduped"]],
            "rows_capped": [stats["rows_capped"]],
            # .get: manifests committed before these counters existed
            "rows_no_tenant": [stats.get("rows_no_tenant", 0)],
            "rows_rate_limited": [stats.get("rows_rate_limited", 0)],
            "resumed": [resumed],
        }
        for v in VIEW_BUILDERS:
            row[f"rows_{v}"] = [stats["view_counts"].get(v, 0)]
        return pa.Table.from_pydict(row, schema=self.STATS_SCHEMA)

    def __call__(self, part: pa.Table, part_id: int) -> pa.Table:
        existing = lineage.load_manifest(self.out_dir, part_id)
        if existing is not None:
            return self._stats_row(part_id, existing, resumed=True)

        cfg = self.config
        views, stats = process_partition(
            part,
            registry=self.registry,
            max_turns_per_conv=cfg.max_turns_per_conv,
            session_gap_us=cfg.session_gap_us,
            metrics_window=cfg.metrics_window,
            drop_root_exits=cfg.drop_root_exits,
            root_exit_exclusions=cfg.root_exit_exclusions,
            latency_sample_pct=cfg.latency_sample_pct,
            tenant_id=cfg.normalize.tenant_id,
            tenant_column=cfg.normalize.tenant_column,
            rate_limit=cfg.rate_limit,
        )
        checksums = {}
        for name, tbl in views.items():
            _, checksums[name] = lineage.write_view_part(
                self.out_dir, name, part_id, tbl
            )
        lineage.commit_manifest(
            self.out_dir,
            part_id,
            rows_in=stats["rows_in"],
            rows_deduped=stats["rows_deduped"],
            rows_capped=stats["rows_capped"],
            view_counts=stats["view_counts"],
            view_checksums=checksums,
            extra={
                "rows_no_tenant": stats["rows_no_tenant"],
                "rows_rate_limited": stats["rows_rate_limited"],
            },
        )
        return self._stats_row(part_id, stats, resumed=False)


def _partition_task(
    part: pa.Table,
    part_id: int,
    *,
    out_dir: str,
    config: "PipelineConfig",
    peer_index: Optional[Dict[str, str]],
    cache_key: str,
):
    """Stateless-task form of the partition stage (default execution path);
    the processor (registry + extras) is built once per worker process."""
    proc = _WORKER_PROCESSORS.get(cache_key)
    if proc is None:
        proc = PartitionProcessor(out_dir, config, peer_index)
        _WORKER_PROCESSORS[cache_key] = proc
    return proc(part, part_id)


DISTRIBUTED_METRICS_THRESHOLD = 64 * 1024 * 1024


def finalize_metrics(out_dir: str, *, force_distributed: bool = False) -> None:
    """Final combine over the per-partition metric partials.  Partial volume
    is bounded by dims × partitions; below the threshold a single-process
    Arrow group-by beats spinning up another distributed pipeline, above it
    (dims exploded: very fine windows × high cardinality) the combine runs
    as a Ray groupby."""
    import glob

    import pyarrow.parquet as pq

    from ..stages.metrics import METRIC_DIMS, finalize_partials

    metrics_dir = os.path.join(out_dir, "metrics")
    partial_dir = os.path.join(out_dir, "metrics_partial")
    if os.path.exists(metrics_dir) or not os.path.exists(partial_dir):
        return
    partial_bytes = sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(partial_dir, "*.parquet"))
    )
    tmp = metrics_dir + "_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    if partial_bytes <= DISTRIBUTED_METRICS_THRESHOLD and not force_distributed:
        final = finalize_partials(pq.read_table(partial_dir))
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(final, os.path.join(tmp, "part-00000.parquet"))
    else:
        import pyarrow.compute as pc

        # int64 window key through the shuffle (see stages/metrics.py note)
        partials = ray.data.read_parquet(partial_dir).map_batches(
            lambda b: b.set_column(
                0, "window_ts", pc.cast(b["window_ts"], pa.int64())
            ),
            batch_format="pyarrow",
        )
        agg = partials.groupby(METRIC_DIMS).sum("num_calls")
        agg.map_batches(
            lambda b: b.rename_columns(METRIC_DIMS + ["num_calls"]).set_column(
                0, "window_ts", pc.cast(b["window_ts"], pa.timestamp("us"))
            ),
            batch_format="pyarrow",
        ).write_parquet(tmp)
    os.rename(tmp, metrics_dir)


def _write_schema_manifest(out_dir: str) -> None:
    """Sink bootstrap (the run-once Pinot view-creator DDL analog,
    hypertrace-view-generator/hypertrace-view-creator/.../all-views/
    application.conf:5-8): one ``_schema.json`` describing every sink."""
    import json

    path = os.path.join(out_dir, "_schema.json")
    if os.path.exists(path):
        return
    manifest = {
        name: {f.name: str(f.type) for f in schema}
        for name, schema in schemas.VIEW_SCHEMAS.items()
    }
    manifest["metrics"] = {f.name: str(f.type) for f in schemas.METRICS}
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.rename(tmp, path)


def _backfill_empty_sinks(out_dir: str) -> None:
    """Write a schema-bearing empty part for any sink dir that no partition
    created (possible only when zero rows routed to that sink everywhere).
    Driver-side, O(#sinks), tiny files — never touches populated sinks."""
    import pyarrow.parquet as pq

    sinks = dict(schemas.VIEW_SCHEMAS)
    sinks["metrics"] = schemas.METRICS
    for name, schema in sinks.items():
        d = os.path.join(out_dir, name)
        if os.path.exists(d):
            continue
        tmp = d + "_tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(schema.empty_table(), os.path.join(tmp, "part-empty.parquet"))
        os.rename(tmp, d)


def _read_normalized(input_path_or_ds, config: "PipelineConfig"):
    """read → normalize → bypass split (the pre-shuffle half of the
    topology), shared by the direct run and the bucketed-corpus writer."""
    if isinstance(input_path_or_ds, Dataset):
        ds = input_path_or_ds
    else:
        read_blocks = config.read_num_blocks
        if read_blocks is None:
            read_blocks = max(8, int(ray.cluster_resources().get("CPU", 4)) * 2)
        from ..sources.parquet import read_parquet_clean

        ds = read_parquet_clean(
            input_path_or_ds, override_num_blocks=read_blocks
        )
    from ..stages.normalize import needs_extraction_for_rules, normalize_light

    if needs_extraction_for_rules(config.normalize):
        ds = normalize(ds, config.normalize)
    else:
        ds = normalize_light(ds, config.normalize)
    return split_bypass(ds, config.normalize)


def _input_fingerprint(input_path_or_ds) -> dict:
    """Identity record for a prepare input: for a path input, a CRC over
    the sorted (name, size) list of its parquet files — enough to catch
    'same dir name, different data'.  A Dataset input has no stable
    identity (lineage isn't serializable), recorded as unverifiable."""
    import zlib

    if isinstance(input_path_or_ds, str):
        p = input_path_or_ds
        if os.path.isdir(p):
            # recursive: read_parquet reads nested/partitioned layouts, so
            # the identity record must cover them too (a top-level-only
            # listing fingerprints every nested dir as the empty string)
            files = sorted(
                os.path.relpath(os.path.join(root, f), p)
                for root, _dirs, names in os.walk(p)
                for f in names
                if f.endswith(".parquet")
            )
            sig = "\x00".join(
                f"{f}:{os.path.getsize(os.path.join(p, f))}" for f in files
            )
        else:
            files = [os.path.basename(p)]
            sig = f"{files[0]}:{os.path.getsize(p)}"
        return {
            "kind": "path",
            "path": os.path.abspath(p),
            "n_files": len(files),
            "crc": zlib.crc32(sig.encode()),
        }
    return {"kind": "none" if input_path_or_ds is None else "dataset"}


def prepare_bucketed_corpus(
    input_path_or_ds: Union[str, Dataset],
    bucket_dir: str,
    config: Optional[PipelineConfig] = None,
    *,
    overwrite: bool = False,
) -> dict:
    """Pre-pay the flagship's ONE shuffle: normalize + route once and store
    the main stream as a conv_id-bucketed table
    (stages/sinks.write_bucketed).  Every later
    ``run_pipeline(..., bucketed_corpus=bucket_dir)`` replays the full
    enrich → fan-out → aggregate with ZERO exchange — the reference's
    replay/reprocessing scenario (Kafka consumers re-reading topics that
    were pre-sharded by trace key,
    JaegerSpanToAvroRawSpanTransformer.java:58-65), where the expensive
    corpus is reprocessed many times with evolving enrichers.

    Re-preparing into a non-empty ``bucket_dir`` is only allowed when the
    input provably matches the one recorded in ``_bucket_meta.json``
    (resume-after-kill of the SAME prepare); anything else — different
    input files, an unverifiable Dataset input, or a dir with no identity
    record — raises, because write_bucketed's resume manifests would
    silently keep stale buckets.  ``overwrite=True`` wipes the dir and
    rebuilds."""
    import json

    from ..stages.sinks import write_bucketed

    config = config or PipelineConfig()
    from ..state.lineage import identity_guard

    if overwrite:
        shutil.rmtree(bucket_dir, ignore_errors=True)
    meta_name = "_bucket_meta.json"
    fp = _input_fingerprint(input_path_or_ds)
    fp["num_buckets"] = config.num_partitions
    if fp["kind"] != "path" and os.path.exists(
        os.path.join(bucket_dir, meta_name)
    ):
        # a Dataset input has no stable identity, so a re-prepare into an
        # existing dir can never be PROVEN to be the same run — refuse
        raise ValueError(
            f"bucket_dir {bucket_dir!r} already exists and the Dataset "
            "input is unverifiable; write_bucketed's resume manifests "
            "would keep stale buckets — pass overwrite=True to rebuild, "
            "or use a fresh dir"
        )
    identity_guard(bucket_dir, fp, filename=meta_name, kind="bucket_dir")
    main, bypass = _read_normalized(input_path_or_ds, config)
    summary = write_bucketed(
        main,
        os.path.join(bucket_dir, "main"),
        key="conv_id",
        num_buckets=config.num_partitions,
    )
    if bypass is not None:
        bp = os.path.join(bucket_dir, "bypass")
        if not os.path.exists(bp):
            tmp = bp + "_tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            bypass.write_parquet(tmp)
            os.rename(tmp, bp)
    return summary


def run_pipeline(
    input_path_or_ds: Union[str, Dataset],
    out_dir: str,
    config: Optional[PipelineConfig] = None,
    *,
    bucketed_corpus: Optional[str] = None,
) -> dict:
    """Execute the full topology; returns the run summary (also written as
    ``_run_manifest.json``).

    ``bucketed_corpus`` (from :func:`prepare_bucketed_corpus`) replays the
    enrich → fan-out → aggregate stages over the stored conv_id-bucketed
    table with ZERO query-time shuffle; ``input_path_or_ds`` is ignored and
    the bucket count must match ``config.num_partitions``."""
    import json

    config = config or PipelineConfig()
    os.makedirs(out_dir, exist_ok=True)

    # resume guard: resume manifests skip committed partitions, which is
    # only safe for the SAME run — same partition layout (hash(conv_id)%P),
    # same config (a changed rate_limit / tenant_column / drop rule would
    # otherwise silently no-op on resumed partitions) and same input.
    # repr(config) covers every knob that shapes routed rows; a Dataset
    # input has no stable identity and is recorded as such (config changes
    # are still caught; changed dataset CONTENTS are the caller's burden,
    # as the north-rule resume contract assumes the same input stream).
    from ..state.lineage import identity_guard

    identity_guard(
        out_dir,
        {
            "num_partitions": config.num_partitions,
            "config": repr(config),
            "input": _input_fingerprint(input_path_or_ds),
            "bucketed_corpus": bucketed_corpus,
        },
        filename="_run_config.json",
        kind="pipeline out_dir",
    )

    t0 = time.perf_counter()
    phases = {}
    if bucketed_corpus is not None:
        from ..stages.sinks import _load_bucket_meta

        meta = _load_bucket_meta(os.path.join(bucketed_corpus, "main"))
        if list(meta["key"]) != ["conv_id"]:
            raise ValueError(
                f"bucketed_corpus is keyed by {meta['key']}, need ['conv_id']"
            )
        if int(meta["num_buckets"]) != config.num_partitions:
            raise ValueError(
                f"bucketed_corpus has {meta['num_buckets']} buckets but "
                f"config.num_partitions={config.num_partitions}; the bucket "
                "layout IS the partition layout — match them"
            )
        main = None
        bp_path = os.path.join(bucketed_corpus, "bypass")
        bypass = ray.data.read_parquet(bp_path) if os.path.exists(bp_path) else None
    else:
        # ship narrow rows through the shuffle when no rule needs extracted
        # columns; the grok extraction then runs post-shuffle in the
        # partition stage (same vectorized kernel, ~40% fewer shuffle bytes)
        main, bypass = _read_normalized(input_path_or_ds, config)

    # optional G4/J2 pre-pass: small-side index built distributively, then
    # broadcast into the partition stage
    peer_index = None
    if config.peer_correlation:
        from ..enrichers.extended import build_peer_index

        peer_index = build_peer_index(
            main
            if main is not None
            # bucketed replay: scan the stored bucket files (no shuffle)
            else ray.data.read_parquet(
                os.path.join(bucketed_corpus, "main", "data")
            )
        )

    # S6 analog: write the sink schema manifest once at pipeline start
    # (the Pinot view-creator bootstrap job)
    _write_schema_manifest(out_dir)

    if bucketed_corpus is not None:
        if config.concurrency is not None:
            raise ValueError(
                "bucketed replay supports the stateless-task path only "
                "(config.concurrency must be None)"
            )
        import hashlib
        from functools import partial

        from ..stages.sinks import bucketed_group_apply

        cache_key = hashlib.md5(
            (out_dir + repr(config) + repr(sorted((peer_index or {}).items()))).encode()
        ).hexdigest()
        task = partial(
            _partition_task,
            out_dir=out_dir,
            config=config,
            peer_index=peer_index,
            cache_key=cache_key,
        )

        def _run_bucket(part: pa.Table, part_id: int) -> pa.Table:
            if part.num_rows == 0:  # hash range empty at bucketing time
                return PartitionProcessor.STATS_SCHEMA.empty_table()
            return task(part, part_id)

        stats_ds = bucketed_group_apply(
            os.path.join(bucketed_corpus, "main"),
            _run_bucket,
            sort_by=["turn_idx", "ts"],
            pass_part_id=True,
        )
    elif config.concurrency is None:
        # default: stateless tasks; processor cached per worker process
        import hashlib
        from functools import partial

        cache_key = hashlib.md5(
            (out_dir + repr(config) + repr(sorted((peer_index or {}).items()))).encode()
        ).hexdigest()
        fn = partial(
            _partition_task,
            out_dir=out_dir,
            config=config,
            peer_index=peer_index,
            cache_key=cache_key,
        )
        stats_ds = group_apply(
            main,
            "conv_id",
            fn,
            pass_part_id=True,
            sort_by=["turn_idx", "ts"],
            num_partitions=config.num_partitions,
            shuffle=config.shuffle,
        )
    else:
        stats_ds = group_apply(
            main,
            "conv_id",
            fn_class=PartitionProcessor,
            fn_constructor_kwargs={
                "out_dir": out_dir,
                "config": config,
                "peer_index": peer_index,
            },
            pass_part_id=True,
            sort_by=["turn_idx", "ts"],
            num_partitions=config.num_partitions,
            concurrency=config.concurrency,
        )
    stats = stats_ds.to_pandas()  # one row per partition — small by design
    phases["main_stage"] = round(time.perf_counter() - t0, 2)
    if stats.empty:  # every row dropped/filtered upstream
        stats = (
            PartitionProcessor.STATS_SCHEMA.empty_table().to_pandas()
        )

    # bypass side output (SpanNormalizer.java:66-70 routed branch)
    if bypass is not None:
        from ..stages.normalize import extract_batch

        bp_dir = os.path.join(out_dir, "bypass")
        if not os.path.exists(bp_dir):
            tmp = bp_dir + "_tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            bp = bypass.map_batches(
                extract_batch,
                batch_format="pyarrow",
                fn_kwargs={"tenant_id": config.normalize.tenant_id},
            )
            if config.normalize.tenant_column is not None:
                # tenant resolution precedes routing in the reference
                # (TenantIdHandler runs in the pre-processor): bypass rows
                # without a tenant are dropped too (uncounted side output)
                bp = bp.map_batches(
                    lambda t: t.filter(pc.is_valid(t["tenant_id"])),
                    batch_format="pyarrow",
                )
            bp.write_parquet(tmp)
            os.rename(tmp, bp_dir)

    # metrics stage: final combine over the per-partition partial counts
    # written by the partition stage (the combiner pattern — the full per-turn
    # data is never re-read or re-shuffled).  Partial volume is bounded by
    # dims × partitions; for the sizes this yields, a single-process Arrow
    # group-by beats spinning up another distributed pipeline.  Should dims
    # explode (very fine windows × high service cardinality), swap this for
    # `windowed_metrics(view_dataset(out_dir, "metrics_partial"))`.
    finalize_metrics(out_dir)
    phases["metrics_finalize"] = round(
        time.perf_counter() - t0 - phases["main_stage"], 2
    )

    # Zero-row runs route no partitions, so no sink dir was ever created —
    # backfill typed empty sinks from the declared schemas (the same
    # contract _schema.json advertises) so view_dataset() and every
    # downstream reader see the schema instead of FileNotFoundError.
    _backfill_empty_sinks(out_dir)

    elapsed = time.perf_counter() - t0
    total_rows_in = int(stats["rows_in"].sum())
    summary = {
        "elapsed_sec": elapsed,
        "num_partitions": len(stats),
        "resumed_partitions": int(stats["resumed"].sum()),
        "rows_in": total_rows_in,
        "rows_deduped": int(stats["rows_deduped"].sum()),
        "rows_capped": int(stats["rows_capped"].sum()),
        "rows_no_tenant": int(stats["rows_no_tenant"].sum()),
        "rows_rate_limited": int(stats["rows_rate_limited"].sum()),
        "view_counts": {
            v: int(stats[f"rows_{v}"].sum()) for v in VIEW_BUILDERS
        },
        "turns_per_sec": total_rows_in / elapsed if elapsed > 0 else 0.0,
        "phases": phases,
        # skew observability: rows per hash partition (A4 operational metrics)
        "partition_rows": {
            "max": int(stats["rows_in"].max()) if len(stats) else 0,
            "mean": float(stats["rows_in"].mean()) if len(stats) else 0.0,
        },
    }
    lineage.write_run_manifest(out_dir, summary)
    return summary


def view_dataset(out_dir: str, view: str) -> Dataset:
    """Read a routed sink back as a Dataset."""
    return ray.data.read_parquet(os.path.join(out_dir, view))
