"""General relational operator coverage over the TPC-H-ish testdata tables.

These exercise the engine's generic building blocks outside the transcript
topology: partial-aggregate + global groupby, broadcast hash join (the J1
pattern — small side via ``ray.put``, probe inside ``map_batches``),
sort-limit, and temporal windowed aggregation.

Money amounts are aggregated as integer cents via ``floor(x*100)`` so sums
are exact and order-independent — float accumulation order differs between
engines and would break value-hash comparison against the DuckDB oracle.
"""

from __future__ import annotations

import os
from typing import Dict, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data import Dataset


def _read(sf_dir: str, table: str, columns: Sequence[str]) -> Dataset:
    from ..sources.parquet import read_parquet_clean

    return read_parquet_clean(
        os.path.join(sf_dir, f"{table}.parquet"), columns=list(columns)
    )


def _cents(col) -> pa.Array:
    """floor(x*100) as int64 — bit-identical to DuckDB FLOOR(x*100)."""
    return pc.cast(pc.floor(pc.multiply(col, pa.scalar(100.0))), pa.int64())


def lineitem_pricing_summary(sf_dir: str) -> Dataset:
    """TPC-H Q1-shaped: partial per-batch aggregation, then a tiny global
    groupby over (returnflag, linestatus)."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )
    names = [
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price_cents",
        "sum_disc_price_cents",
        "count_order",
    ]

    def partial(batch: pa.Table) -> pa.Table:
        disc_price = pc.multiply(
            pc.multiply(
                batch["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), batch["l_discount"]),
            ),
            pa.scalar(100.0),
        )
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": pc.cast(batch["l_quantity"], pa.int64()),
                "sum_base_price_cents": _cents(batch["l_extendedprice"]),
                "sum_disc_price_cents": pc.cast(pc.floor(disc_price), pa.int64()),
            }
        )
        return (
            t.group_by(["l_returnflag", "l_linestatus"])
            .aggregate(
                [
                    ("sum_qty", "sum"),
                    ("sum_base_price_cents", "sum"),
                    ("sum_disc_price_cents", "sum"),
                    ([], "count_all"),
                ]
            )
            .rename_columns(names)
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby(["l_returnflag", "l_linestatus"]).sum(
        ["sum_qty", "sum_base_price_cents", "sum_disc_price_cents", "count_order"]
    )
    return agg.map_batches(lambda b: b.rename_columns(names), batch_format="pyarrow")


def revenue_by_nation(sf_dir: str) -> Dataset:
    """Broadcast hash join: orders ⋈ customer ⋈ nation (small sides broadcast
    via ray.put, probed per batch) → revenue per nation."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    nation_names = dict(
        zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())
    )
    cust_nation = {
        ck: nation_names.get(nk)
        for ck, nk in zip(
            cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist()
        )
    }
    lookup_ref = ray.put(cust_nation)
    names = ["n_name", "revenue_cents", "num_orders"]

    def _probe(batch: pa.Table) -> pa.Table:
        # stateless task; broadcast dict fetched zero-copy in-task (no actor
        # pool → no ObjectRef-ctor restart hazard ray#53727, no worker cap)
        lookup: Dict[int, str] = ray.get(lookup_ref)
        keys = batch["o_custkey"].to_numpy(zero_copy_only=False)
        uniq, inverse = np.unique(keys, return_inverse=True)
        mapped = np.array([lookup.get(int(u)) for u in uniq], dtype=object)
        t = pa.table(
            {
                "n_name": pa.array(mapped[inverse], pa.string()),
                "revenue_cents": _cents(batch["o_totalprice"]),
            }
        )
        return (
            t.group_by(["n_name"])
            .aggregate([("revenue_cents", "sum"), ([], "count_all")])
            .rename_columns(names)
        )

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    partials = orders.map_batches(_probe, batch_format="pyarrow")
    agg = partials.groupby("n_name").sum(["revenue_cents", "num_orders"])
    return agg.map_batches(lambda b: b.rename_columns(names), batch_format="pyarrow")


def top_orders(sf_dir: str, n: int = 10) -> Dataset:
    """Global sort + limit with a deterministic tiebreak."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(n)


def events_hourly(sf_dir: str) -> Dataset:
    """Temporal windowed aggregation over the events stream table."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    names = ["hour_ts", "event_type", "sum_value_cents", "num_events"]

    def partial(batch: pa.Table) -> pa.Table:
        # the shuffle key rides as int64 micros: Ray's sort-shuffle boundary
        # sampling round-trips timestamp keys through numpy datetimes and
        # logs precision warnings (and compares slower than ints)
        t = pa.table(
            {
                "hour_ts": pc.cast(
                    pc.floor_temporal(batch["ts"], unit="hour"), pa.int64()
                ),
                "event_type": batch["event_type"],
                "sum_value_cents": _cents(batch["value"]),
            }
        )
        return (
            t.group_by(["hour_ts", "event_type"])
            .aggregate([("sum_value_cents", "sum"), ([], "count_all")])
            .rename_columns(names)
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby(["hour_ts", "event_type"]).sum(
        ["sum_value_cents", "num_events"]
    )

    def _final(b: pa.Table) -> pa.Table:
        b = b.rename_columns(names)
        return b.set_column(
            0, "hour_ts", pc.cast(b["hour_ts"], pa.timestamp("us"))
        )

    return agg.map_batches(_final, batch_format="pyarrow")
