"""Distributed graph computation over edge datasets.

Reference parity: the reference's graph work is per-trace
(``ApiTraceGraph`` builds an in-memory span DAG per trace,
hypertrace-core-graph-builder/.../ApiTraceGraphBuilder — graphs of a few
hundred nodes).  At corpus scale the interesting graphs span the WHOLE
dataset (service call graphs, co-occurrence graphs, near-dup pair graphs),
so these operators work on an *edge Dataset* instead: the edge list stays
distributed and only node-sized state crosses to the driver.

- :func:`pagerank` — fixed-point integer PageRank.  All arithmetic is
  exact int64 (ranks scaled by ``scale``, per-edge contribution
  ``rank // out_degree``, damping as ``(pct * m) // 100``), so the result
  is bit-reproducible across partitionings AND mirrorable in SQL with
  plain integer division — no float drift between engines.
- :func:`distinct_edges` — exact edge dedup (batch-local pre-dedup, one
  hash exchange).

Partitioning assumptions (documented per the 100-TB contract):
- the EDGE list is unbounded (streamed in blocks, pre-aggregated per batch
  before anything crosses the wire);
- the NODE set (rank vector + out-degrees) fits on the driver / in one
  broadcast object — true for service graphs, entity graphs, cluster
  graphs.  For node sets beyond driver memory, hash-partition the rank
  vector and replace the broadcast with a cogroup join per iteration
  (stages/grouping.cogroup gives the primitive); the per-iteration partial
  tables here are already keyed by ``dst`` to make that swap mechanical.

Related: connected components (BSP min-label propagation) lives in
``stages/dedup.py`` next to its near-dup producers.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from .grouping import DEFAULT_NUM_PARTITIONS, group_apply, run_boundaries

__all__ = ["distinct_edges", "pagerank", "bfs_hops"]


def _ckpt_meta_guard(checkpoint_dir: str, meta: dict, loose: tuple = ()) -> None:
    """Write-or-validate the run-identity record for an iteration checkpoint
    dir (the ``num_partitions`` check of state/lineage.write_partitioned,
    applied to iterative jobs).

    ``meta.json`` is written atomically next to the first checkpoint; a
    resumed run must present identical values for every key not listed in
    ``loose`` (keys like ``iters``/``max_hops`` are loose: extending the
    iteration budget of the SAME job is a legitimate continuation, while a
    different graph / damping / seed set silently poisons the resumed state
    and must raise).  A dir that already holds checkpoint files but no
    meta.json predates identity tracking (or belongs to something else) —
    refuse it rather than trust it.
    """
    import os as _os

    from ..state.lineage import identity_guard

    identity_guard(
        checkpoint_dir,
        meta,
        loose=loose,
        kind="checkpoint_dir",
        has_prior_output=lambda: any(
            f.endswith(".parquet") for f in _os.listdir(checkpoint_dir)
        ),
    )


def _edge_fingerprint(edges: Dataset, src: str, dst: str) -> list:
    """Order-independent fingerprint of an edge Dataset: (count, sum of
    per-pair mixed hashes mod 2^64).  One column-pruned streaming pass;
    only two ints reach the driver.  Used to pin checkpoint identity —
    collisions need an adversarial edge set, fine for wrong-dir detection."""
    from .grouping import _hash_column

    def _fp(batch: pa.Table) -> pa.Table:
        hs = (
            _hash_column(batch[src], 1 << 31)
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        hd = (
            _hash_column(batch[dst], 1 << 31)
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        mixed = (hs * np.uint64(0x9E3779B97F4A7C15)) ^ (
            hd + np.uint64(0x85EBCA6B)
        )
        return pa.table(
            {
                "n": pa.array([batch.num_rows], pa.int64()),
                "fp": pa.array(
                    [int(mixed.sum(dtype=np.uint64))], pa.uint64()
                ),
            }
        )

    n, fp = 0, 0
    for row in (
        edges.select_columns([src, dst])
        .map_batches(_fp, batch_format="pyarrow")
        .take_all()
    ):
        n += int(row["n"])
        fp = (fp + int(row["fp"])) % (1 << 64)
    return [n, fp]


def _node_fingerprint(ds: Dataset, col: str) -> list:
    """Order-independent fingerprint of one key column: (count, sum of
    hashes mod 2^64) — the single-column form of ``_edge_fingerprint``.
    Streaming; two ints reach the driver regardless of set size."""
    from .grouping import _hash_column

    def _fp(batch: pa.Table) -> pa.Table:
        hs = (
            _hash_column(batch[col], 1 << 31)
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        mixed = hs * np.uint64(0x9E3779B97F4A7C15) + np.uint64(0x85EBCA6B)
        return pa.table(
            {
                "n": pa.array([batch.num_rows], pa.int64()),
                "fp": pa.array([int(mixed.sum(dtype=np.uint64))], pa.uint64()),
            }
        )

    n, fp = 0, 0
    for row in (
        ds.select_columns([col]).map_batches(_fp, batch_format="pyarrow").take_all()
    ):
        n += int(row["n"])
        fp = (fp + int(row["fp"])) % (1 << 64)
    return [n, fp]


def distinct_edges(
    ds: Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> Dataset:
    """Exact DISTINCT on (src, dst): batch-local dedup first so only unique
    pairs per block cross the one hash exchange."""

    def _local(batch: pa.Table) -> pa.Table:
        return batch.select([src, dst]).group_by([src, dst]).aggregate([])

    def _first(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part
        a = part[src].to_numpy(zero_copy_only=False)
        b = part[dst].to_numpy(zero_copy_only=False)
        firsts = run_boundaries(a, b)[:-1]
        return part.take(pa.array(firsts))

    return group_apply(
        ds.map_batches(_local, batch_format="pyarrow"),
        [src, dst],
        _first,
        num_partitions=num_partitions,
    )


def pagerank(
    edges: Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    iters: int = 2,
    scale: int = 10**12,
    damping_pct: int = 85,
    dedup: bool = True,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    checkpoint_dir: Optional[str] = None,
) -> Dataset:
    """Integer fixed-point PageRank over an edge Dataset.

    ``checkpoint_dir`` makes the iteration resumable: the (node, rank)
    vector after iteration ``i`` is written atomically as
    ``iter_{i}.parquet``; a re-invoked run loads the highest completed
    iteration and runs only the remaining passes.  Ranks are exact int64,
    so a resumed run is bit-identical to an uninterrupted one.

    Exact semantics (mirror in SQL with ``//`` integer division):

    - ``N`` = count of distinct nodes (union of both edge endpoints)
    - ``r_0(v) = scale // N``
    - ``base  = (100 - damping_pct) * scale // (100 * N)``
    - ``m_i(v) = sum over distinct edges u->v of  r_{i-1}(u) // deg(u)``
    - ``r_i(v) = base + (damping_pct * m_i(v)) // 100``

    Dangling nodes (no out-edges) leak their mass — the classic
    "PageRank with leak" variant; totals stay <= ``scale`` so int64 never
    overflows.  Returns one row per node: ``(node, rank)``.

    Execution: the edge list is streamed every iteration; each batch
    pre-aggregates per-dst contribution sums (node-side lookups are one
    ``searchsorted`` against the broadcast rank vector), so the driver only
    ever sees node-sized partials.  ``iters`` passes, zero all-to-all
    shuffles beyond the optional initial edge dedup.
    """
    if dedup:
        edges = distinct_edges(
            ds=edges, src=src, dst=dst, num_partitions=num_partitions
        )
    edges = edges.select_columns([src, dst]).materialize()

    # node set + out-degrees: per-batch partials, node-sized driver combine
    # (dst-only nodes ride along with degree 0)
    def _deg_partial(batch: pa.Table) -> pa.Table:
        a = batch[src].to_numpy(zero_copy_only=False)
        b = batch[dst].to_numpy(zero_copy_only=False)
        us, cnt = np.unique(a, return_counts=True)
        ud = np.unique(b)
        return pa.table(
            {
                "n": pa.array(np.concatenate([us, ud])),
                "d": pa.array(
                    np.concatenate(
                        [cnt.astype(np.int64), np.zeros(len(ud), np.int64)]
                    )
                ),
            }
        )

    deg: dict = {}
    node_set = set()
    for row in edges.map_batches(_deg_partial, batch_format="pyarrow").take_all():
        deg[row["n"]] = deg.get(row["n"], 0) + int(row["d"])
        node_set.add(row["n"])

    nodes = np.array(sorted(node_set))
    n_nodes = len(nodes)
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([]), "rank": pa.array([], pa.int64())})
        )
    deg_arr = np.zeros(n_nodes, dtype=np.int64)
    idx_of = {n: i for i, n in enumerate(nodes.tolist())}
    for k, v in deg.items():
        deg_arr[idx_of[k]] = v

    rank = np.full(n_nodes, scale // n_nodes, dtype=np.int64)
    base = (100 - damping_pct) * scale // (100 * n_nodes)

    import os as _os

    import pyarrow.parquet as _pq

    def _iter_path(i: int) -> str:
        return _os.path.join(checkpoint_dir, f"iter_{i}.parquet")

    start_iter = 0
    if checkpoint_dir is not None:
        import zlib as _zlib

        # graph identity = node set + out-degree vector (both already
        # driver-held here): a different edge set with identical degrees
        # on identical nodes is the only collision, and damping/scale pin
        # the arithmetic.  iters is loose — extending the budget resumes.
        _ckpt_meta_guard(
            checkpoint_dir,
            {
                "op": "pagerank",
                "n_nodes": int(n_nodes),
                "n_edges": int(deg_arr.sum()),
                "nodes_crc": _zlib.crc32(
                    "\x00".join(map(str, nodes.tolist())).encode()
                ),
                "deg_crc": _zlib.crc32(deg_arr.tobytes()),
                "damping_pct": int(damping_pct),
                "scale": int(scale),
                "iters": int(iters),
            },
            loose=("iters",),
        )
        while start_iter < iters and _os.path.exists(_iter_path(start_iter + 1)):
            start_iter += 1
        if start_iter:
            tbl = _pq.read_table(_iter_path(start_iter))
            saved = dict(
                zip(tbl["node"].to_pylist(), tbl["rank"].to_pylist())
            )
            rank = np.array(
                [saved[n] for n in nodes.tolist()], dtype=np.int64
            )

    for _it in range(start_iter, iters):
        contrib = np.where(deg_arr > 0, rank // np.maximum(deg_arr, 1), 0)
        state_ref = ray.put((nodes, contrib))

        def _emit(batch: pa.Table, ref=state_ref) -> pa.Table:
            ns, cb = ray.get(ref)
            s_idx = np.searchsorted(
                ns, batch[src].to_numpy(zero_copy_only=False)
            )
            t = pa.table(
                {"dst": batch[dst], "m": pa.array(cb[s_idx])}
            )
            return t.group_by("dst").aggregate([("m", "sum")])

        m = np.zeros(n_nodes, dtype=np.int64)
        for row in edges.map_batches(_emit, batch_format="pyarrow").take_all():
            m[idx_of[row["dst"]]] += int(row["m_sum"])
        rank = base + damping_pct * m // 100
        if checkpoint_dir is not None:
            p = _iter_path(_it + 1)
            _pq.write_table(
                pa.table({"node": pa.array(nodes), "rank": pa.array(rank)}),
                p + ".tmp",
            )
            _os.rename(p + ".tmp", p)

    return ray.data.from_arrow(
        pa.table({"node": pa.array(nodes), "rank": pa.array(rank)})
    )


def triangle_count(
    edges: Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> Dataset:
    """Exact global triangle count of the undirected simple graph — the
    classic MapReduce wedge-check algorithm, fully composed from this
    repo's own primitives:

    1. canonicalize + dedup edges (u < v) — :func:`distinct_edges` shape;
    2. WEDGES: for every center node, all unordered neighbor pairs with
       their multiplicity = common-neighbor count, via
       :func:`~.analytics.cooccurrence_counts` (ragged pair expansion, one
       exchange);
    3. CLOSE: wedge (v, w) forms triangles iff edge (v, w) exists — one
       :func:`~.joins.cogroup_join` on the composite pair key (chain-safe
       exchange, both sides distributed);
    4. every triangle closes exactly 3 wedges ⇒ ``T = Σ closed // 3``.

    Wedge volume is Σ deg² — for skewed graphs orient edges by degree
    first (the arboricity-bounded variant) before step 2; the synthetic
    corpora here don't need it and the hook is the same ``cooccurrence``
    call on the oriented adjacency.  Returns a one-row Dataset
    ``(n_triangles:int64)``.
    """
    from .analytics import cooccurrence_counts
    from .joins import cogroup_join

    def _canon(batch: pa.Table) -> pa.Table:
        a = batch[src].cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = batch[dst].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = a != b  # drop self-loops
        a, b = a[keep], b[keep]
        return pa.table(
            {"u": pa.array(np.minimum(a, b)), "v": pa.array(np.maximum(a, b))}
        )

    canon = distinct_edges(
        edges.map_batches(_canon, batch_format="pyarrow"),
        src="u",
        dst="v",
        num_partitions=num_partitions,
    )

    # adjacency in both directions: center -> neighbor
    def _adj(batch: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [
                pa.table({"center": batch["u"], "nbr": batch["v"]}),
                pa.table({"center": batch["v"], "nbr": batch["u"]}),
            ]
        )

    wedges = cooccurrence_counts(
        canon.map_batches(_adj, batch_format="pyarrow"),
        key="center",
        value_col="nbr",
        out_a="u",
        out_b="v",
        num_partitions=num_partitions,
    )  # (u, v, n_keys = common-neighbor count), u < v by construction

    closed = cogroup_join(
        wedges, canon, on=["u", "v"], num_partitions=num_partitions
    )

    def _partial_sum(batch: pa.Table) -> pa.Table:
        s = int(pc.sum(batch["n_keys"]).as_py() or 0)
        return pa.table({"closed": pa.array([s], pa.int64())})

    total = sum(
        r["closed"]
        for r in closed.map_batches(_partial_sum, batch_format="pyarrow").take_all()
    )
    import ray.data as _rd

    return _rd.from_arrow(
        pa.table({"n_triangles": pa.array([total // 3], pa.int64())})
    )


def bfs_hops(
    edges: Dataset,
    seeds: Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 3,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    checkpoint_dir: Optional[str] = None,
) -> Dataset:
    """Distributed BFS: minimum hop distance (≤ ``max_hops``) from a seed
    set over a directed edge Dataset.  Returns ``(node, dist)`` — one row
    per reachable node, ``dist`` = length of the shortest path.

    Frontier expansion is level-synchronous (the BSP/Pregel pattern): each
    hop is frontier ⋈ edges on the source endpoint (cogroup join — both
    sides co-shuffled, nothing broadcast), a batch-local-first DISTINCT on
    the neighbor set, and an ANTI join against the visited set so each node
    is assigned the FIRST (minimum) hop that reaches it.  Per-hop state
    (frontier, visited) is node-sized and stays in the object store —
    ``materialize()`` here pins blocks, it never collects to the driver;
    the edge list is re-streamed from its source each hop (lineage, not a
    driver copy).  Iteration count is bounded by ``max_hops`` and stops
    early when a frontier comes back empty.

    ``checkpoint_dir`` makes the ITERATION resumable (the north rule's
    checkpoint discipline applied to iterative jobs, not just sinks): each
    completed hop's frontier is written atomically as
    ``hop_{i}.parquet`` (tmp + rename, like state/lineage); a killed run
    re-invoked with the same dir reloads every completed hop and continues
    from the first missing one — a 100-hop job that dies at hop 97 redoes
    3 hops, not 97.  An empty frontier file records early termination.
    """
    import os as _os

    import pyarrow.parquet as _pq

    import ray as _ray
    import ray.data as _rd

    from .analytics import distinct_rows
    from .joins import cogroup_join

    node_schema = pa.schema([("node", pa.int64())])
    result_schema = pa.schema([("node", pa.int64()), ("dist", pa.int64())])

    def _empty_result() -> Dataset:
        return _rd.from_arrow(result_schema.empty_table())

    if checkpoint_dir is not None:
        # run identity: seed + edge fingerprints (streaming, two ints each
        # to the driver — a large seed set never materializes here) +
        # endpoint column names.  max_hops is loose — re-running with a
        # larger budget continues the walk (the resume loop below never
        # loads hops beyond the CURRENT max_hops, so a smaller budget is
        # also safe).
        _ckpt_meta_guard(
            checkpoint_dir,
            {
                "op": "bfs_hops",
                "seeds_fp": _node_fingerprint(seeds, "node"),
                "edges_fp": _edge_fingerprint(edges, src, dst),
                "src": src,
                "dst": dst,
                "max_hops": int(max_hops),
            },
            loose=("max_hops",),
        )

    def _ckpt_path(hop: int) -> str:
        return _os.path.join(checkpoint_dir, f"hop_{hop}.parquet")

    def _ckpt_write(hop: int, frontier_ds) -> None:
        """Atomic per-hop frontier checkpoint (tmp + rename); frontiers are
        node-sized, so one file per hop is the right granularity."""
        if checkpoint_dir is None:
            return
        _os.makedirs(checkpoint_dir, exist_ok=True)
        tables = [
            t
            for t in _ray.get(frontier_ds.to_arrow_refs())
            if t.num_rows
        ]
        tbl = (
            pa.concat_tables(tables, promote_options="default")
            if tables
            else node_schema.empty_table()
        )
        path = _ckpt_path(hop)
        _pq.write_table(tbl.select(["node"]), path + ".tmp")
        _os.rename(path + ".tmp", path)

    def _with_dist(d: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "dist", pa.array(np.full(t.num_rows, d, dtype=np.int64))
            )

        return f

    # resume: reload every completed hop's frontier from the checkpoint dir
    out = []
    frontier = None
    visited = None
    start_hop = 0
    if checkpoint_dir is not None:
        # never load hops beyond the CURRENT max_hops — a resume with a
        # smaller budget must not return distances the caller excluded
        while start_hop <= max_hops and _os.path.exists(_ckpt_path(start_hop)):
            tbl = _pq.read_table(_ckpt_path(start_hop))
            if tbl.num_rows == 0:  # recorded early termination
                if not out:  # terminated at hop 0: empty seed set
                    return _empty_result()
                result = out[0]
                for part in out[1:]:
                    result = result.union(part)
                return result
            f_ds = _rd.from_arrow(tbl).materialize()
            out.append(
                f_ds.map_batches(_with_dist(start_hop), batch_format="pyarrow")
            )
            visited = f_ds if visited is None else visited.union(f_ds).materialize()
            frontier = f_ds
            start_hop += 1
    if start_hop == 0:
        frontier = distinct_rows(
            seeds.select_columns(["node"]), "node", num_partitions=num_partitions
        ).materialize()
        if frontier.count() == 0:
            # empty seed set: an empty distinct() has schema None, which
            # the hop-1 cogroup cannot consume — record termination and
            # return a TYPED empty (node, dist) dataset
            _ckpt_write(0, _rd.from_arrow(node_schema.empty_table()))
            return _empty_result()
        visited = frontier
        out = [frontier.map_batches(_with_dist(0), batch_format="pyarrow")]
        _ckpt_write(0, frontier)
        start_hop = 1
    edge_pairs = edges.map_batches(
        lambda t, s=src, d=dst: pa.table({"node": t[s], "nbr": t[d]}),
        batch_format="pyarrow",
    )
    for hop in range(start_hop, max_hops + 1):
        nbrs = cogroup_join(
            frontier,
            edge_pairs,
            on=["node"],
            num_partitions=num_partitions,
        ).map_batches(
            lambda t: pa.table({"node": t["nbr"]}), batch_format="pyarrow"
        )
        nbrs = distinct_rows(nbrs, "node", num_partitions=num_partitions)
        new = cogroup_join(
            nbrs,
            visited,
            on=["node"],
            how="left_anti",
            num_partitions=num_partitions,
        ).materialize()
        if new.count() == 0:
            _ckpt_write(hop, _rd.from_arrow(node_schema.empty_table()))
            break
        _ckpt_write(hop, new)
        out.append(new.map_batches(_with_dist(hop), batch_format="pyarrow"))
        visited = visited.union(new).materialize()
        frontier = new
    result = out[0]
    for part in out[1:]:
        result = result.union(part)
    return result
