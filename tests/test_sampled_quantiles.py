"""Bottom-k hash-sample quantiles (stages/sketches.sampled_quantiles):
the properties SQL can't check — realized rank-error bound against exact
quantiles, layout independence (the sketch is a pure function of the row
set), and lossless mergeability (union then bottom-k == bottom-k of union).
"""
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from hypertrace_ingester_ray.stages.sketches import sampled_quantiles

PCTS = (25, 50, 75, 90, 99)


def _table(n, seed=7):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "value": pa.array(rng.lognormal(3.0, 1.2, n)),
        }
    )


def _run(tbl, k=512, **kw):
    out = sampled_quantiles(
        ray.data.from_arrow(tbl),
        value_col="value",
        id_col="event_id",
        k=k,
        pcts=PCTS,
        **kw,
    ).take_all()
    return {r["pct"]: r["value"] for r in out}


def test_rank_error_within_sample_bound(ray_session):
    n = 20_000
    tbl = _table(n)
    est = _run(tbl, k=512)
    vals = np.sort(tbl["value"].to_numpy())
    for p in PCTS:
        # realized rank of the estimate vs target rank, in pct points;
        # k=512 gives ~±4.4 points at 95% conf — assert a loose 8
        realized = np.searchsorted(vals, est[p], side="right") / n * 100
        assert abs(realized - p) < 8.0, (p, realized)


def test_layout_independent(ray_session):
    tbl = _table(5_000)
    base = _run(tbl)
    # same rows, different block layouts and row orders
    perm = np.random.default_rng(0).permutation(tbl.num_rows)
    shuffled = tbl.take(pa.array(perm))
    for blocks in (1, 7):
        ds = ray.data.from_arrow(shuffled).repartition(blocks)
        out = sampled_quantiles(
            ds, value_col="value", id_col="event_id", k=512, pcts=PCTS
        ).take_all()
        assert {r["pct"]: r["value"] for r in out} == base


def test_mergeable_union_equals_whole(ray_session):
    tbl = _table(4_000)
    a, b = tbl.slice(0, 1500), tbl.slice(1500)
    whole = _run(tbl)
    union = sampled_quantiles(
        ray.data.from_arrow(a).union(ray.data.from_arrow(b)),
        value_col="value",
        id_col="event_id",
        k=512,
        pcts=PCTS,
    ).take_all()
    assert {r["pct"]: r["value"] for r in union} == whole


def test_empty_and_null_inputs(ray_session):
    empty = pa.table(
        {"event_id": pa.array([], pa.int64()), "value": pa.array([], pa.float64())}
    )
    assert _run(empty) == {}
    nulls = pa.table(
        {
            "event_id": pa.array([1, None, 3], pa.int64()),
            "value": pa.array([None, 2.0, 5.0], pa.float64()),
        }
    )
    est = _run(nulls)  # only row id=3 survives both validity filters
    assert set(est.values()) == {5.0}


# --- grouped variant -------------------------------------------------------

from hypertrace_ingester_ray.stages.sketches import sampled_quantiles_by

G_PCTS = (25, 50, 75)


def _gtable(n, seed=11):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "grp": pa.array(rng.choice(["a", "b", "c"], n)),
            "value": pa.array(rng.normal(50.0, 10.0, n)),
        }
    )


def _grun(tbl, k=128, blocks=1):
    ds = ray.data.from_arrow(tbl)
    if blocks > 1:
        ds = ds.repartition(blocks)
    out = sampled_quantiles_by(
        ds,
        by="grp",
        value_col="value",
        id_col="event_id",
        k=k,
        pcts=G_PCTS,
        num_partitions=4,
    ).take_all()
    return {(r["grp"], r["pct"]): r["value"] for r in out}


def test_grouped_layout_independent(ray_session):
    tbl = _gtable(6_000)
    base = _grun(tbl)
    assert len(base) == 3 * len(G_PCTS)
    perm = np.random.default_rng(1).permutation(tbl.num_rows)
    assert _grun(tbl.take(pa.array(perm)), blocks=5) == base


def test_grouped_rank_error_within_bound(ray_session):
    tbl = _gtable(9_000)
    est = _grun(tbl, k=256)
    grp = tbl["grp"].to_numpy(zero_copy_only=False)
    vals = tbl["value"].to_numpy()
    for g in ("a", "b", "c"):
        gv = np.sort(vals[grp == g])
        for p in G_PCTS:
            realized = np.searchsorted(gv, est[(g, p)], side="right") / len(gv) * 100
            assert abs(realized - p) < 10.0, (g, p, realized)


def test_grouped_small_group_is_exact(ray_session):
    # a group smaller than k is sampled in full -> exact ceil-rank quantiles
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(10, dtype=np.int64)),
            "grp": pa.array(["z"] * 10),
            "value": pa.array(np.arange(10, dtype=np.float64)),
        }
    )
    est = _grun(tbl, k=128)
    # n=10: ceil-ranks for 25/50/75 -> 3rd/5th/8th smallest = 2.0/4.0/7.0
    assert est == {("z", 25): 2.0, ("z", 50): 4.0, ("z", 75): 7.0}


def test_grouped_null_keys_and_empty(ray_session):
    empty = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "grp": pa.array([], pa.string()),
            "value": pa.array([], pa.float64()),
        }
    )
    assert _grun(empty) == {}
    nulls = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "grp": pa.array(["a", None, "a", None]),
            "value": pa.array([1.0, 2.0, 3.0, 4.0]),
        }
    )
    est = _grun(nulls)
    # the null key is its own group (SQL NULL-group semantics)
    assert est[(None, 50)] in (2.0, 4.0)
    assert est[("a", 50)] in (1.0, 3.0)
