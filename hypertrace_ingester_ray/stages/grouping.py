"""Hash-partitioned, vectorized group processing — the pipeline's one shuffle.

Reference semantics: raw-spans-grouper keys every span by
``TraceIdentity(tenant_id, trace_id)`` and accumulates spans per key in RocksDB
state stores until a 30 s session-inactivity window closes
(/root/reference/raw-spans-grouper/raw-spans-grouper/src/main/java/org/
hypertrace/core/rawspansgrouper/RawSpansProcessor.java:186-247).  For bounded
Parquet input the session window collapses to a plain hash-shuffle group-by;
the state stores disappear entirely.

Ray-Data-native design — ``group_apply``:

Instead of ``groupby(conv_id).map_groups(fn)`` (one Python call per
conversation — billions of tiny calls at 10^12-turn scale), we hash the group
key into ``num_partitions`` buckets and run ``groupby("_part").map_groups``.
Each task then receives a whole *partition* containing only complete
conversations, sorts it once, and processes every group in the partition with
vectorized numpy segment operations (run-length boundaries).  Python overhead
is O(partitions), not O(groups), while the shuffle volume is identical.

Skew handling, two complementary mechanisms:
- order/graph-scoped computations (enricher DAG, episode graphs) cannot be
  split without breaking semantics, so group size is bounded by a per-group
  cap (mirroring the reference's INFLIGHT_TRACE_MAX_SPAN_COUNT,
  RawSpansProcessor.java:347-388) and partitions hold many groups so one hot
  key never exceeds a single partition's budget;
- ASSOCIATIVE aggregations use ``salted_group_apply``: hot keys found by a
  key-column-only pre-count are spread across salt_factor sub-groups for
  concurrent partial aggregation, merged in a tiny second pass.
"""

from __future__ import annotations

import os
import zlib
from typing import Callable, Dict, Optional, Sequence, Union

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

PART_COL = "__part"

DEFAULT_NUM_PARTITIONS = int(os.environ.get("HTR_NUM_PARTITIONS", "64"))


# ---------------------------------------------------------------------------
# numpy segment helpers (vectorized per-group ops over a key-sorted table)
# ---------------------------------------------------------------------------


def run_boundaries(*key_arrays: np.ndarray) -> np.ndarray:
    """Start offsets of each key-run in key-sorted arrays: [0, s1, ..., n]."""
    n = len(key_arrays[0])
    if n == 0:
        return np.array([0], dtype=np.int64)
    change = np.zeros(n - 1, dtype=bool)
    for a in key_arrays:
        change |= a[1:] != a[:-1]
    starts = np.flatnonzero(change) + 1
    return np.concatenate(([0], starts, [n]))


def segment_ids_from_boundaries(bounds: np.ndarray) -> np.ndarray:
    """Row → 0-based segment index. bounds as returned by run_boundaries."""
    n = bounds[-1]
    seg = np.zeros(n, dtype=np.int64)
    if len(bounds) > 2:
        seg[bounds[1:-1]] = 1
        np.cumsum(seg, out=seg)
    return seg


def segmented_cumcount(seg_ids: np.ndarray) -> np.ndarray:
    """Per-segment 0-based running count (seg_ids must be sorted)."""
    n = len(seg_ids)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    idx = np.arange(n, dtype=np.int64)
    starts = np.zeros(n, dtype=np.int64)
    first = np.concatenate(([0], np.flatnonzero(seg_ids[1:] != seg_ids[:-1]) + 1))
    starts[first] = idx[first]
    np.maximum.accumulate(starts, out=starts)
    return idx - starts


def segmented_broadcast_first(values: np.ndarray, bounds: np.ndarray) -> np.ndarray:
    """Broadcast each segment's first value to all of its rows."""
    lengths = np.diff(bounds)
    return np.repeat(values[bounds[:-1]], lengths)


def segmented_sum(values: np.ndarray, bounds: np.ndarray) -> np.ndarray:
    """Per-segment sum, one value per segment."""
    return np.add.reduceat(values, bounds[:-1]) if bounds[-1] > 0 else np.zeros(0)


# ---------------------------------------------------------------------------
# hash partitioning
# ---------------------------------------------------------------------------


def _hash_column(col: pa.ChunkedArray, num_partitions: int) -> pa.Array:
    """Deterministic vectorized hash of a key column into [0, num_partitions).

    Uses pandas' SipHash-based ``hash_array`` (stable across processes), the
    same role as the reference's key-hash Kafka partitioner
    (SpanNormalizer.java:72-80).
    """
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_integer(arr.type):
        # Exact-integer path even when nulls are present: a NaN round-trip
        # through float64 would round keys with |v| > 2^53 (e.g. 64-bit
        # fingerprints), splitting the same key across partitions depending
        # on per-batch null presence.  Fill nulls with 0 pre-conversion and
        # overwrite their hash with a fixed constant after, so the NULL
        # group lands on one deterministic partition on every architecture.
        null_mask = None
        if arr.null_count:
            null_mask = pc.is_null(arr).to_numpy(zero_copy_only=False)
            arr = pc.fill_null(arr, pa.scalar(0, arr.type))
        np_vals = arr.to_numpy(zero_copy_only=False)
        if np_vals.dtype.kind == "i":  # signed: wrap mod 2^64 (two's compl.)
            np_vals = np_vals.astype(np.int64, copy=False).view(np.uint64)
        else:
            np_vals = np_vals.astype(np.uint64, copy=False)
        hashed = np_vals * np.uint64(0x9E3779B97F4A7C15)  # Fibonacci mix
        hashed ^= hashed >> np.uint64(29)
        if null_mask is not None:
            hashed = hashed.copy() if not hashed.flags.writeable else hashed
            hashed[null_mask] = np.uint64(0xD1B54A32D192ED03)
    else:
        hashed = pd.util.hash_array(
            np.asarray(arr.to_pandas(), dtype=object), categorize=False
        )
    return pa.array((hashed % np.uint64(num_partitions)).astype(np.int32))


def add_part_column(batch: pa.Table, key, num_partitions: int) -> pa.Table:
    """Append the shuffle-partition column; ``key`` may be one column name or
    a list (all participate in the hash — required for salted sub-groups)."""
    keys = [key] if isinstance(key, str) else list(key)
    acc = None
    for k in keys:
        h = _hash_column(batch[k], 1 << 31).to_numpy(zero_copy_only=False).astype(
            np.uint64
        )
        acc = h if acc is None else (acc * np.uint64(1_000_003)) ^ h
    part = (acc % np.uint64(num_partitions)).astype(np.int32)
    # strip schema metadata (parquet/pandas provenance): schemas WITH
    # metadata are unhashable, which makes Ray's shuffle log a
    # "Failed to hash the schemas" warning per block pair at the reduce
    return batch.append_column(PART_COL, pa.array(part)).replace_schema_metadata(
        None
    )


def hot_key_counts(
    ds: Dataset, key: str, *, threshold: int, sample_rate: int = 1
) -> Dict[str, int]:
    """Pre-count pass: keys whose row count exceeds ``threshold``.

    Only the key column leaves the scan, and the count is combined per
    batch before the global groupby — cheap when keys REPEAT within
    batches (conversations: many turns per conv).  This is the 'pre-count
    group sizes' step of skew-aware salting (SURVEY.md §4).

    For near-unique keys (join keys), per-batch combining compresses
    nothing and the pre-count groupby would shuffle ~every row.  Pass
    ``sample_rate`` R > 1 to count a deterministic 1-in-R row sample
    instead: the exchange shrinks R×, and a key with ≥ ``threshold`` rows
    is detected from ~threshold/R sampled hits (the detection cutoff is
    ``threshold/(2R)``, so missing a truly-hot key needs its sample count
    to fall below HALF its expectation — vanishing for threshold/R ≥ ~32).
    Returned counts are then ESTIMATES (scaled back by R) and the hot set
    may include keys down to ~threshold/2 — callers that use the set for
    ROUTING (skew_join, salting) are insensitive to both; callers that
    need exact counts must keep R = 1.
    """

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key])
        if sample_rate > 1 and t.num_rows:
            # deterministic strided row sample: the phase varies per batch
            # (derived from batch content) so same-key runs that span
            # batches are sampled at independent offsets
            phase = zlib.crc32(
                f"{t.num_rows}:{t[key][0].as_py()}".encode()
            ) % sample_rate
            t = t.take(pa.array(np.arange(phase, t.num_rows, sample_rate)))
        return (
            t.group_by([key])
            .aggregate([([], "count_all")])
            .rename_columns([key, "n"])
        )

    # The global count-sum rides the repo's direct two-stage hash exchange
    # (group_apply shuffle="direct"), not the Ray Data sort-based groupby:
    # the histogram is one narrow (key, n) column pair, and at bench scale
    # the sort-groupby's fixed costs (sample, sort, reduce scheduling) were
    # ~the cost of the join being protected (BASELINE.md round-4 audit).
    # Filter DISTRIBUTED, inside the reduce: at 10^12 turns the per-key
    # histogram has billions of rows, but the hot set (keys above
    # threshold) is tiny by definition — only it may be materialized.
    cutoff = threshold if sample_rate == 1 else max(1, threshold // (2 * sample_rate))

    def _reduce(part: pa.Table) -> pa.Table:
        g = (
            part.group_by([key])
            .aggregate([("n", "sum")])
            .rename_columns([key, "n"])
        )
        return g.filter(pc.greater(g["n"], cutoff))

    hot_only = group_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        key,
        _reduce,
        num_partitions=32,
    )
    return {
        row[key]: int(row["n"]) * sample_rate for row in hot_only.take_all()
    }


def salted_group_apply(
    ds: Dataset,
    key: str,
    partial_fn: Callable[[pa.Table], pa.Table],
    merge_fn: Callable[[pa.Table], pa.Table],
    *,
    sort_by: Optional[Sequence[str]] = None,
    hot_threshold: int = 100_000,
    salt_factor: int = 16,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> Dataset:
    """Skew-aware salted aggregation for ASSOCIATIVE per-group computations.

    A single hot key (one conversation with millions of turns) would pin an
    entire partition task.  Here keys above ``hot_threshold`` (found by a
    pre-count on the key column only) are salted across ``salt_factor``
    sub-groups: ``partial_fn`` runs per (key, salt) slice — concurrently for
    a hot key — and ``merge_fn`` combines each key's partials in a second,
    tiny ``group_apply`` pass.  Cold keys take salt 0 and skip nothing.

    Correctness contract: ``merge_fn(concat(partial_fn(slices))) ==
    partial_fn(whole)`` — i.e. the computation must be decomposable
    (sums/counts/min/max/distinct-sets).  Order-sensitive, graph-shaped
    computations cannot be salted; for those the engine caps group size
    instead (assemble_conversations), mirroring the reference's
    INFLIGHT_TRACE_MAX_SPAN_COUNT (RawSpansProcessor.java:347-388).
    """
    import ray as _ray

    hot = hot_key_counts(ds, key, threshold=hot_threshold)
    # broadcast the hot set once; each stateless task fetches it zero-copy
    # in-task (knn_bruteforce pattern) — no actor pool, so no ObjectRef-ctor
    # restart hazard (ray#53727) and no fixed worker cap
    hot_ref = _ray.put(pa.array(sorted(hot)) if hot else None)
    salt_col = "__salt"

    def _add_salt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        hot_arr = _ray.get(hot_ref)
        if hot_arr is not None:
            is_hot = pc.is_in(batch[key], value_set=hot_arr).to_numpy(
                zero_copy_only=False
            )
            # round-robin within the batch spreads a hot key evenly; the
            # merge step makes the final result independent of assignment
            salts = np.where(
                is_hot, np.arange(n, dtype=np.int64) % salt_factor, 0
            ).astype(np.int32)
        else:
            salts = np.zeros(n, dtype=np.int32)
        return batch.append_column(salt_col, pa.array(salts))

    salted = ds.map_batches(_add_salt, batch_format="pyarrow")

    def _partial(part: pa.Table) -> pa.Table:
        return partial_fn(part.drop_columns([salt_col]))

    partials = group_apply(
        salted,
        [key, salt_col],
        _partial,
        sort_by=sort_by,
        num_partitions=num_partitions,
    )
    # second level: merge each key's ≤ salt_factor partial rows (tiny)
    return group_apply(
        partials, key, merge_fn, num_partitions=max(8, num_partitions // 4)
    )


# ---------------------------------------------------------------------------
# direct two-stage exchange (the fast path for moderate fan-out)
# ---------------------------------------------------------------------------

# Above this partition count the direct exchange degrades (map_tasks ×
# partitions tiny objects — the classic quadratic-shuffle problem) and
# group_apply falls back to Ray Data's sort-based shuffle, which merges
# map outputs hierarchically.  512 × ~1k map blocks ≈ 500k objects is the
# comfortable ceiling for one object store director.
DIRECT_SHUFFLE_MAX_PARTITIONS = int(
    os.environ.get("HTR_DIRECT_SHUFFLE_MAX_PARTS", "512")
)

# Shuffle compression (Spark-style): exchange slices travel as compressed
# Arrow IPC instead of raw Arrow tables.  Trades map/reduce CPU for exchange
# bytes.  Single-box A/B (BASELINE.md round 3): LOSES locally — the plasma
# "exchange" is a shared-memory copy, so bytes are already cheap and the
# codec steals cycles (32-CPU e2e: none 2.48M turns/s, lz4 2.17M, zstd
# 1.96M).  On a multi-node cluster the exchange crosses NICs (10-25 Gb/s ≪
# memory bandwidth) and compression is the standard win (Spark defaults to
# lz4); flip HTR_SHUFFLE_COMPRESSION=lz4 there.  Values: "lz4" | "zstd" |
# "" (off, local default) | "auto" (probe once per process: stay off on a
# single node, and on a multi-node cluster pick lz4 only if the wire time
# saved on the first exchanged block beats the codec cost — see
# resolve_shuffle_compression).
SHUFFLE_COMPRESSION = os.environ.get("HTR_SHUFFLE_COMPRESSION", "")

# one decision per process: the workload's compressibility doesn't change
# between exchanges, and flip-flopping codecs would defeat lineage replay
_RESOLVED_COMPRESSION: Optional[str] = None


def decide_shuffle_compression(
    num_alive_nodes: int,
    sample: Optional[pa.Table],
    nic_gbps: float,
) -> str:
    """Pure decision rule for ``HTR_SHUFFLE_COMPRESSION=auto``.

    Single node → off: the plasma "exchange" is a shared-memory copy, so the
    codec only steals cycles (measured A/B in BASELINE.md).  Multi-node →
    compress iff the wire seconds saved by shrinking the sample block exceed
    the measured compress+decompress seconds (the Spark-style bytes-vs-CPU
    trade, resolved empirically instead of by default)."""
    if num_alive_nodes <= 1:
        return ""
    if sample is None or sample.num_rows == 0:
        return "lz4"  # nothing to measure; lz4 is the safe wire default
    import time as _time

    raw_bytes = sample.nbytes
    t0 = _time.perf_counter()
    buf = _ipc_compress(sample, "lz4")
    t1 = _time.perf_counter()
    _ipc_decompress(buf)
    t2 = _time.perf_counter()
    codec_s = (t1 - t0) + (t2 - t1)
    wire_saved_s = max(0, raw_bytes - len(buf)) * 8.0 / (nic_gbps * 1e9)
    return "lz4" if wire_saved_s > codec_s else ""


def resolve_shuffle_compression(sample_block_ref=None) -> str:
    """Resolve the effective shuffle codec, probing once per process when
    HTR_SHUFFLE_COMPRESSION=auto.  ``sample_block_ref`` is an ObjectRef to
    the first map-side block (a same-node plasma read — cheap); the probe
    samples its first 65 536 rows.  NIC bandwidth can't be measured from
    inside a task, so it comes from HTR_NIC_GBPS (default 10, a typical
    cloud NIC)."""
    global _RESOLVED_COMPRESSION
    if SHUFFLE_COMPRESSION != "auto":
        return SHUFFLE_COMPRESSION
    if _RESOLVED_COMPRESSION is not None:
        return _RESOLVED_COMPRESSION
    import ray as _ray

    try:
        alive = sum(1 for n in _ray.nodes() if n.get("Alive"))
    except Exception:
        alive = 1
    sample = None
    if alive > 1 and sample_block_ref is not None:
        try:
            block = _ray.get(sample_block_ref)
            if not isinstance(block, pa.Table):
                from ray.data.block import BlockAccessor

                block = BlockAccessor.for_block(block).to_arrow()
            sample = block.slice(0, 65536)
        except Exception:
            sample = None
    nic_gbps = float(os.environ.get("HTR_NIC_GBPS", "10"))
    _RESOLVED_COMPRESSION = decide_shuffle_compression(alive, sample, nic_gbps)
    return _RESOLVED_COMPRESSION


def _ipc_compress(t: pa.Table, codec: str) -> pa.Buffer:
    sink = pa.BufferOutputStream()
    opts = pa.ipc.IpcWriteOptions(compression=codec)
    with pa.ipc.new_stream(sink, t.schema, options=opts) as w:
        w.write_table(t)
    return sink.getvalue()


def _ipc_decompress(buf) -> pa.Table:
    with pa.ipc.open_stream(buf) as r:
        return r.read_all()


def _shuffle_map_fn(block, keys, num_partitions, compression="", identity=False):
    """Map side of the direct exchange: split one input block into
    ``num_partitions`` key-complete slices (+ a per-partition row-count
    vector the driver uses to skip empty partitions without fetching data).

    Slices are zero-copy views; Ray's Arrow serialization trims them to
    logical bounds on transfer (verified: a 50-row slice of an 11 MB table
    pickles to ~6 KB), so object-store volume equals data volume."""
    if not isinstance(block, pa.Table):  # pandas / other block formats
        from ray.data.block import BlockAccessor

        block = BlockAccessor.for_block(block).to_arrow()
    if block.num_rows == 0:
        # joins/filters can emit zero-row blocks with an EMPTY schema —
        # hashing the key columns would KeyError; they contribute nothing
        return tuple([None] * num_partitions) + (
            np.zeros(num_partitions, dtype=np.int64),
        )
    if identity:
        # keys[0] already holds the partition id (range partitioning etc.)
        ids = pc.cast(block[keys[0]], pa.int32())
        mm = pc.min_max(ids)
        if block.num_rows and (
            mm["min"].as_py() < 0 or mm["max"].as_py() >= num_partitions
        ):
            raise ValueError(
                f"identity partition ids out of range [0, {num_partitions})"
            )
        t = block.append_column(PART_COL, ids).replace_schema_metadata(None)
    else:
        t = add_part_column(block, keys, num_partitions)
    part = t[PART_COL].to_numpy(zero_copy_only=False)
    order_idx = np.argsort(part, kind="stable")
    sorted_t = t.take(pa.array(order_idx))
    bounds = np.searchsorted(part[order_idx], np.arange(num_partitions + 1))
    counts = np.diff(bounds)
    if compression:
        out = [
            _ipc_compress(
                sorted_t.slice(lo, hi - lo).drop_columns([PART_COL]), compression
            )
            if hi > lo
            else None
            for lo, hi in zip(bounds[:-1], bounds[1:])
        ]
    else:
        out = [
            sorted_t.slice(lo, hi - lo).drop_columns([PART_COL]) if hi > lo else None
            for lo, hi in zip(bounds[:-1], bounds[1:])
        ]
    out.append(counts)
    return tuple(out)


def _shuffle_reduce_fn(fn, order, pass_part_id, part_id, *tables):
    """Reduce side: concat this partition's slices from every map task
    (decompressing IPC-compressed slices), sort once by the full group/order
    key, run the user fn."""
    tables = [
        _ipc_decompress(t) if isinstance(t, pa.Buffer) else t
        for t in tables
        if t is not None
    ]
    tables = [t for t in tables if t.num_rows]
    t = pa.concat_tables(tables, promote_options="default")
    if order:
        # sort_by's take compacts the chunked result — no combine_chunks copy
        t = t.sort_by([(c, "ascending") for c in order])
    else:
        t = t.combine_chunks()
    return fn(t, part_id) if pass_part_id else fn(t)


def _direct_group_apply(
    ds, keys, fn, *, pass_part_id, order, num_partitions, identity=False
):
    """Two-stage raw-task hash exchange, bypassing the sort-shuffle machinery.

    Why: Ray Data's sort-based ``groupby().map_groups`` costs ~1.8 s on the
    6 M-row bench corpus even for a no-op consumer and is NOT byte-bound
    (dropping 65 % of the bytes saves 7 %) — the overhead is the sort
    executor itself.  A direct exchange (map tasks emit ``num_partitions``
    pre-hashed slices, reduce tasks concat + sort + process) runs the same
    exchange in ~1.1 s.  Kafka's keyed-topic exchange
    (SpanNormalizer.java:72-80) is exactly this shape: producers write
    hash-routed slices, one consumer per partition.

    Streaming: map tasks launch as upstream blocks materialize
    (``iter_internal_ref_bundles`` is a streaming iterator); the reduce
    barrier is inherent to any hash shuffle.  Fault tolerance: map/reduce
    are deterministic tasks, so Ray lineage reconstructs lost slices.
    """
    import ray as _ray

    map_remote = _ray.remote(num_returns=num_partitions + 1)(_shuffle_map_fn)
    reduce_remote = _ray.remote(_shuffle_reduce_fn)

    compression = SHUFFLE_COMPRESSION
    map_refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for block_ref in bundle.block_refs:
            if compression == "auto":
                # probe on the first materialized block, once per process;
                # later blocks (and later exchanges) reuse the decision
                compression = resolve_shuffle_compression(block_ref)
            map_refs.append(
                map_remote.remote(
                    block_ref, keys, num_partitions, compression, identity
                )
            )
    if not map_refs:
        import ray.data as _rd

        return _rd.from_arrow([])
    # counts are tiny (P int64s per map task); fetching them blocks until all
    # maps finish — which is exactly when reduces become runnable anyway
    counts = np.sum(_ray.get([r[num_partitions] for r in map_refs]), axis=0)
    reduce_refs = [
        reduce_remote.remote(
            fn, order, pass_part_id, p, *[r[p] for r in map_refs]
        )
        for p in range(num_partitions)
        if counts[p] > 0
    ]
    import ray.data as _rd

    return _rd.from_arrow_refs(reduce_refs)


class _PartitionRunner:
    """map_groups callable-class wrapper: sorts the partition, strips the
    partition column, instantiates the user's processor once per actor
    (the JVM-singleton-per-worker analog of
    StructuredTraceEnrichProcessor.java:38-61)."""

    def __init__(self, inner_cls, ctor_kwargs, order, pass_part_id):
        self.inner = inner_cls(**(ctor_kwargs or {}))
        self.order = order
        self.pass_part_id = pass_part_id

    def __call__(self, part: pa.Table) -> pa.Table:
        part_id = int(part[PART_COL][0].as_py()) if part.num_rows else -1
        part = part.drop_columns([PART_COL]).sort_by(
            [(c, "ascending") for c in self.order]
        )
        if self.pass_part_id:
            return self.inner(part, part_id)
        return self.inner(part)


def group_apply(
    ds: Dataset,
    key: Union[str, Sequence[str]],
    fn: Optional[Callable[[pa.Table], pa.Table]] = None,
    *,
    fn_class: Optional[type] = None,
    fn_constructor_kwargs: Optional[dict] = None,
    pass_part_id: bool = False,
    sort_by: Optional[Sequence[str]] = None,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    shuffle: Optional[str] = None,
    identity_partition: bool = False,
    **map_groups_kwargs,
) -> Dataset:
    """Apply a partition processor to hash partitions of complete ``key``-groups.

    The processor receives a ``pyarrow.Table`` sorted by ``[*keys, *sort_by]``
    that contains every row of every key-group assigned to the partition — the
    vectorized analog of the reference's per-trace processing loop
    (TraceEmitPunctuator.java:116-196), amortized over many groups per call.

    Pass either ``fn`` (stateless task) or ``fn_class`` (+ ``concurrency=`` in
    ``map_groups_kwargs``) for an actor-pool stage with per-worker state.

    ``shuffle`` picks the exchange: ``"direct"`` = two-stage raw-task hash
    exchange (fastest for ≤ DIRECT_SHUFFLE_MAX_PARTITIONS partitions),
    ``"sort"`` = Ray Data sort-based groupby (scales to unbounded fan-out,
    required for the ``fn_class`` actor-pool path).  Default (None) =
    ``"direct"`` for stateless ``fn`` within the partition ceiling, else
    ``"sort"``.  Both produce identical partitions (same hash, same order).
    """
    keys = [key] if isinstance(key, str) else list(key)
    order = keys + list(sort_by or [])

    if shuffle is None:
        shuffle = (
            "direct"
            if fn_class is None
            and not map_groups_kwargs
            and num_partitions <= DIRECT_SHUFFLE_MAX_PARTITIONS
            else "sort"
        )
    if identity_partition and shuffle != "direct":
        raise ValueError(
            "identity_partition requires the direct exchange "
            "(stateless fn, num_partitions <= DIRECT_SHUFFLE_MAX_PARTITIONS)"
        )
    if shuffle == "direct":
        if fn_class is not None:
            raise ValueError("shuffle='direct' supports the stateless fn path only")
        return _direct_group_apply(
            ds,
            keys,
            fn,
            pass_part_id=pass_part_id,
            order=order,
            num_partitions=num_partitions,
            identity=identity_partition,
        )

    ds = ds.map_batches(
        add_part_column,
        batch_format="pyarrow",
        fn_kwargs={"key": keys, "num_partitions": num_partitions},
    )

    if fn_class is not None:
        # bind the ctor args into the CLASS (cloudpickled inline with the
        # task spec) instead of fn_constructor_kwargs: Ray Data ships actor
        # constructor kwargs through the object store, which triggers the
        # ray#53727 restart warning (lost-ref restarts would fail)
        bound = (fn_class, fn_constructor_kwargs, order, pass_part_id)

        class _BoundRunner(_PartitionRunner):
            def __init__(self):
                super().__init__(*bound)

        return ds.groupby(PART_COL).map_groups(
            _BoundRunner,
            batch_format="pyarrow",
            **map_groups_kwargs,
        )

    def _run(part: pa.Table) -> pa.Table:
        part_id = int(part[PART_COL][0].as_py()) if part.num_rows else -1
        part = part.drop_columns([PART_COL]).sort_by([(c, "ascending") for c in order])
        if pass_part_id:
            return fn(part, part_id)
        return fn(part)

    return ds.groupby(PART_COL).map_groups(
        _run, batch_format="pyarrow", **map_groups_kwargs
    )


# ---------------------------------------------------------------------------
# conversation assembly (G1-G3 analog), fully vectorized
# ---------------------------------------------------------------------------


def assemble_conversations(
    part: pa.Table,
    *,
    max_turns_per_conv: int = 100_000,
    session_gap_us: Optional[int] = None,
) -> pa.Table:
    """Order, dedup, cap and sessionize one partition of conversations.

    Semantics mirrored from the reference:
      - stable ``(conv_id, turn_idx)`` ordering with ``ts`` tiebreak
        (TraceEmitPunctuator.java:156-158 builds the trace from ordered spans);
      - exact dedup keep-first per ``(conv_id, turn_idx)``
        (span-id HashSet dedup, TraceEmitPunctuator.java:123-150);
      - per-conversation turn cap — the skew guard
        (RawSpansProcessor.java:347-388);
      - optional ts-gap sessionization (the 30 s session-inactivity window,
        RawSpansProcessor.java:70-76, as a batch gap-split).

    Expects ``part`` sorted by (conv_id, turn_idx, ts).  Adds ``session_id``.
    Returns ``(table, n_deduped, n_capped)``.
    """
    if part.num_rows == 0:
        return part.append_column("session_id", pa.array([], pa.int32())), 0, 0
    n_deduped = 0
    n_capped = 0

    conv = part["conv_id"].combine_chunks().dictionary_encode()
    conv_codes = conv.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    turn_idx = part["turn_idx"].combine_chunks().to_numpy(zero_copy_only=False)

    # keep-first dedup on (conv_id, turn_idx): first occurrence in sort order
    keep = np.ones(len(conv_codes), dtype=bool)
    keep[1:] = (conv_codes[1:] != conv_codes[:-1]) | (turn_idx[1:] != turn_idx[:-1])
    if not keep.all():
        idx = np.flatnonzero(keep)
        n_deduped = len(keep) - len(idx)
        part = part.take(pa.array(idx))
        conv_codes = conv_codes[idx]

    # per-conversation cap (keep the first max_turns in order)
    bounds = run_boundaries(conv_codes)
    seg = segment_ids_from_boundaries(bounds)
    pos = segmented_cumcount(seg)
    if int(np.diff(bounds).max(initial=0)) > max_turns_per_conv:
        idx = np.flatnonzero(pos < max_turns_per_conv)
        n_capped = len(pos) - len(idx)
        part = part.take(pa.array(idx))
        conv_codes = conv_codes[idx]
        bounds = run_boundaries(conv_codes)
        seg = segment_ids_from_boundaries(bounds)

    # sessionization: split a conversation when the ts gap exceeds the window
    ts = part["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    if session_gap_us is not None and len(ts) > 0:
        new_session = np.zeros(len(ts), dtype=np.int64)
        gap = np.zeros(len(ts), dtype=bool)
        gap[1:] = (ts[1:] - ts[:-1]) > session_gap_us
        gap[bounds[:-1]] = False  # conversation start is session 0
        new_session[gap] = 1
        sess_cum = np.cumsum(new_session)
        session_id = sess_cum - segmented_broadcast_first(sess_cum, bounds)
    else:
        session_id = np.zeros(len(ts), dtype=np.int64)

    return (
        part.append_column("session_id", pa.array(session_id.astype(np.int32))),
        n_deduped,
        n_capped,
    )


# ---------------------------------------------------------------------------
# null-safe native groupby: Ray Data's sort-based shuffle groupby crashes on
# null keys (numpy searchsorted can't order None vs str inside
# sort_and_partition).  SQL GROUP BY keeps the NULL group, so dropping rows
# is wrong — instead fill each key with an improbable typed sentinel before
# the native groupby and restore nulls after.
# ---------------------------------------------------------------------------

_NULL_STR_SENTINEL = "\x00\x00<null>"
_NULL_INT_SENTINEL = -(2**62) - 777


def _key_sentinel(t: pa.DataType):
    """Typed null-group sentinel, or None when the type has no sentinel.

    Returning None (rather than raising) means fill/restore become no-ops
    for key types beyond int/string/timestamp (date32, decimal, ...): a
    non-null groupby on such a key keeps working; a NULL-keyed one falls
    through to Ray's native behavior.  Collision caveat: a genuine key
    value exactly equal to the sentinel ("\\x00\\x00<null>" / -(2**62)-777)
    would be restored to NULL — both values sit far outside any realistic
    tenant/trace/doc key domain, which is the documented assumption at
    every call site (hopping windows, salted rollups, native groupbys).
    """
    if pa.types.is_integer(t):
        return pa.scalar(_NULL_INT_SENTINEL, t)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pa.scalar(_NULL_STR_SENTINEL, t)
    if pa.types.is_timestamp(t):
        return pa.scalar(_NULL_INT_SENTINEL, pa.int64()).cast(t)
    return None


def fill_null_keys(batch: pa.Table, keys) -> pa.Table:
    """Replace nulls in key columns with typed sentinels (pre-groupby)."""
    for k in [keys] if isinstance(keys, str) else keys:
        col = batch[k]
        if col.null_count:
            sent = _key_sentinel(col.type)
            if sent is None:
                continue  # unsupported key type: pass through unchanged
            i = batch.schema.get_field_index(k)
            batch = batch.set_column(i, k, pc.fill_null(col, sent))
    return batch


def restore_null_keys(batch: pa.Table, keys) -> pa.Table:
    """Turn key sentinels back into nulls (post-groupby)."""
    for k in [keys] if isinstance(keys, str) else keys:
        col = batch[k]
        sent = _key_sentinel(col.type)
        if sent is None:
            continue  # unsupported key type: nothing was filled
        mask = pc.equal(col, sent)
        if pc.any(mask).as_py():
            i = batch.schema.get_field_index(k)
            batch = batch.set_column(
                i, k, pc.if_else(mask, pa.scalar(None, col.type), col)
            )
    return batch


# ---------------------------------------------------------------------------
# cogroup: two datasets co-partitioned by one key, processed pairwise
# ---------------------------------------------------------------------------


def _cogroup_reduce_fn(
    fn, order_l, order_r, schema_l, schema_r, part_id, n_left, *tables
):
    def _concat(slices, order, schema):
        ts = [
            _ipc_decompress(t) if isinstance(t, pa.Buffer) else t
            for t in slices
            if t is not None
        ]
        ts = [t for t in ts if t.num_rows]
        if not ts:
            return schema.empty_table()
        t = pa.concat_tables(ts, promote_options="default")
        if order:
            return t.sort_by([(c, "ascending") for c in order])
        return t.combine_chunks()

    left = _concat(tables[:n_left], order_l, schema_l)
    right = _concat(tables[n_left:], order_r, schema_r)
    return fn(left, right)


def cogroup(
    left,
    right,
    key: Union[str, Sequence[str]],
    fn: Callable[[pa.Table, pa.Table], pa.Table],
    *,
    left_sort: Optional[Sequence[str]] = None,
    right_sort: Optional[Sequence[str]] = None,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    left_schema: Optional[pa.Schema] = None,
    right_schema: Optional[pa.Schema] = None,
):
    """Co-partition TWO datasets by the same key hash and hand each reduce
    task the pair of partition tables: ``fn(left_part, right_part)`` with
    both sides sorted by ``[*keys, *side_sort]`` and containing every row of
    every key-group assigned to the partition.

    This is the general two-input form of :func:`group_apply` (Ray Data has
    joins but no cogroup; Spark/Flink/Beam expose it as CoGroup/connect).
    Anything expressible as per-key logic over two keyed inputs — keyed set
    difference, per-key stream alignment, interval matching with custom
    semantics — composes from it with the vectorized run-length kernels.
    ONE exchange per side (same hash → same partition ids, so matching keys
    are guaranteed co-located); nothing is broadcast, so BOTH sides may be
    corpus-sized.  Same ``key`` columns must exist in both inputs.

    Zero-row inputs: Ray loses the schema of an empty dataset after any
    transform (``ds.schema()`` → None), so a certainly-empty side cannot
    report its payload columns.  ``left_schema``/``right_schema`` are
    explicit fallbacks for that case; without one, the empty side is
    synthesized as a KEYS-ONLY empty table (key fields copied from the
    known side — valid for fns that only touch the other side's payload
    when keys match, e.g. local joins), and when BOTH sides are schema-less
    the result is an untyped empty dataset.
    """
    import ray as _ray
    import ray.data as _rd

    keys = [key] if isinstance(key, str) else list(key)
    order_l = keys + list(left_sort or [])
    order_r = keys + list(right_sort or [])

    def _as_arrow_schema(sch) -> pa.Schema:
        base = getattr(sch, "base_schema", sch)
        if isinstance(base, pa.Schema):
            return base
        # pandas-block datasets report a PandasBlockSchema (numpy dtypes);
        # object dtype has no Arrow equivalent — pandas object columns are
        # strings by convention, and an EMPTY typed table only needs a
        # best-effort type anyway
        def _to_pa(t):
            if isinstance(t, pa.DataType):
                return t
            t = np.dtype(t)
            return pa.string() if t == np.dtype(object) else pa.from_numpy_dtype(t)

        return pa.schema(
            [pa.field(n, _to_pa(t)) for n, t in zip(base.names, base.types)]
        )

    raw_l, raw_r = left.schema(), right.schema()
    schema_l = _as_arrow_schema(raw_l) if raw_l is not None else left_schema
    schema_r = _as_arrow_schema(raw_r) if raw_r is not None else right_schema
    if schema_l is None and schema_r is None:
        return _rd.from_arrow([])  # both certainly empty, nothing typed left
    if schema_l is None or schema_r is None:
        known = schema_l if schema_l is not None else schema_r
        missing = [k for k in keys if known.get_field_index(k) < 0]
        if missing:
            raise ValueError(
                f"cogroup: key column(s) {missing} absent from the known "
                "side's schema; pass left_schema/right_schema for the "
                "empty side"
            )
        synth = pa.schema([known.field(k) for k in keys])
        side = "left" if schema_l is None else "right"
        # LOUD: an outer-join fn over a keys-only side silently drops that
        # side's payload columns (the output schema becomes data-dependent
        # on which side happened to be empty) — callers that need schema
        # stability must pass left_schema/right_schema
        print(
            f"[cogroup] WARNING: {side} side is empty with unrecoverable "
            f"schema; synthesizing KEYS-ONLY {list(synth.names)} — pass "
            f"{side}_schema= if fn needs that side's payload columns "
            "(e.g. outer joins)"
        )
        if schema_l is None:
            schema_l = synth
        else:
            schema_r = synth

    map_remote = _ray.remote(num_returns=num_partitions + 1)(_shuffle_map_fn)
    reduce_remote = _ray.remote(_cogroup_reduce_fn)

    def _map_side(ds):
        refs = []
        for bundle in ds.iter_internal_ref_bundles():
            for block_ref in bundle.block_refs:
                refs.append(
                    map_remote.remote(
                        block_ref, keys, num_partitions, SHUFFLE_COMPRESSION
                    )
                )
        return refs

    refs_l, refs_r = _map_side(left), _map_side(right)
    if not refs_l and not refs_r:
        return _rd.from_arrow([])
    counts = np.zeros(num_partitions, dtype=np.int64)
    for side in (refs_l, refs_r):
        if side:
            counts += np.sum(
                _ray.get([r[num_partitions] for r in side]), axis=0
            )
    reduce_refs = [
        reduce_remote.remote(
            fn,
            order_l,
            order_r,
            schema_l,
            schema_r,
            p,
            len(refs_l),
            *[r[p] for r in refs_l],
            *[r[p] for r in refs_r],
        )
        for p in range(num_partitions)
        if counts[p] > 0
    ]
    out = _rd.from_arrow_refs(reduce_refs)
    # pin the map-side slice refs to the result dataset's lifetime: dropping
    # them at function exit races Ray-core's submitted-task ref bookkeeping
    # under heavy long-session churn (observed reference_count.cc /
    # task_manager.cc check failures ~115 queries into one session)
    out._htr_cogroup_keepalive = (refs_l, refs_r)
    return out
