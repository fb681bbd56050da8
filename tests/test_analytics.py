"""Analytic window functions, pivot, distinct-count (stages/analytics.py)
and sketches (stages/sketches.py) — checked against pandas ground truth."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from hypertrace_ingester_ray.stages import analytics, sketches


@pytest.fixture(scope="module")
def long_table(ray_session):
    rng = np.random.RandomState(7)
    n = 2000
    t = pa.table(
        {
            "k": pa.array([f"g{int(i)}" for i in rng.randint(0, 17, n)]),
            "ord": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array(rng.randint(0, 40, n).astype(np.int64)),
            "cat": pa.array(
                [["a", "b", "c", "zz"][int(i)] for i in rng.randint(0, 4, n)]
            ),
        }
    )
    return ray.data.from_arrow(t).repartition(5), t.to_pandas()


def test_window_functions_match_pandas(long_table, ray_session):
    ds, pdf = long_table
    out = (
        analytics.window_functions(
            ds,
            key="k",
            order_col="ord",
            lag={"prev_v": "v"},
            lead={"next_cat": "cat"},
            cumsum={"run_v": "v"},
            row_number="rn",
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("ord")
        .reset_index(drop=True)
    )
    g = pdf.sort_values("ord").groupby("k", sort=False)
    exp = pdf.sort_values("ord").assign(
        prev_v=g["v"].shift(1),
        next_cat=g["cat"].shift(-1),
        run_v=g["v"].cumsum(),
        rn=g.cumcount() + 1,
    )
    exp = exp.sort_values("ord").reset_index(drop=True)
    pd.testing.assert_series_equal(
        out["prev_v"].astype("float64"), exp["prev_v"], check_names=False
    )
    assert out["next_cat"].where(out["next_cat"].notna(), None).tolist() == \
        exp["next_cat"].where(exp["next_cat"].notna(), None).tolist()
    assert (out["run_v"] == exp["run_v"]).all()
    assert (out["rn"] == exp["rn"]).all()


def test_window_functions_null_cumsum(ray_session):
    t = pa.table(
        {
            "k": ["a", "a", "a"],
            "ord": pa.array([1, 2, 3], pa.int64()),
            "v": pa.array([5, None, 7], pa.int64()),
        }
    )
    out = (
        analytics.window_functions(
            ray.data.from_arrow(t), key="k", order_col="ord", cumsum={"s": "v"}
        )
        .to_pandas()
        .sort_values("ord")
    )
    assert out["s"].tolist() == [5, 5, 12]  # NULL treated as 0, like SQL SUM


def test_pivot_counts(long_table, ray_session):
    ds, pdf = long_table
    out = (
        analytics.pivot_counts(
            ds, row_key="k", col_key="cat", categories=["a", "b", "c"],
            num_partitions=4,
        )
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    exp = (
        pdf.assign(one=1)
        .pivot_table(
            index="k", columns="cat", values="one", aggfunc="sum", fill_value=0
        )
        .sort_index()
    )
    for c in ("a", "b", "c"):
        assert (out[f"{c}_cnt"] == exp[c]).all()
    assert "zz_cnt" not in out.columns  # only requested categories


def test_distinct_count_exact(long_table, ray_session):
    ds, pdf = long_table
    out = (
        analytics.distinct_count(ds, key="k", value_col="v", num_partitions=4)
        .to_pandas()
        .set_index("k")["n_distinct"]
        .sort_index()
    )
    exp = pdf.groupby("k")["v"].nunique().sort_index()
    assert (out == exp).all()


def test_distinct_count_ignores_nulls(ray_session):
    t = pa.table(
        {"k": ["a", "a", "b"], "v": pa.array([1, None, None], pa.int64())}
    )
    out = (
        analytics.distinct_count(ray.data.from_arrow(t), key="k", value_col="v")
        .to_pandas()
        .set_index("k")["n_distinct"]
    )
    assert out.get("a") == 1
    assert out.get("b", 0) in (0, None) or "b" not in out.index


# ---------------------------------------------------------------------------
# sketches
# ---------------------------------------------------------------------------


def test_hll_error_bound(ray_session):
    rng = np.random.RandomState(3)
    rows = []
    true = {"s": 500, "m": 5_000, "l": 20_000}
    ks, vs = [], []
    for k, card in true.items():
        vals = rng.randint(0, 1 << 62, card * 2).astype(np.int64) % card
        base = hash(k) % 100000 * 1_000_000
        ks += [k] * len(vals)
        vs += list(base + vals)  # disjoint value spaces per key
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(ks), "v": pa.array(vs, pa.int64())})
    ).repartition(6)
    out = (
        sketches.hll_distinct(ds, key="k", value_col="v", p=12, num_partitions=4)
        .to_pandas()
        .set_index("k")["n_distinct_approx"]
    )
    for k, card in true.items():
        exact = len(set(v for kk, v in zip(ks, vs) if kk == k))
        assert abs(out[k] - exact) / exact < 0.05, (k, out[k], exact)


def test_hll_deterministic_across_partitioning(ray_session):
    t = pa.table(
        {
            "k": pa.array(["x"] * 1000),
            "v": pa.array(np.arange(1000, dtype=np.int64) % 333),
        }
    )
    a = sketches.hll_distinct(
        ray.data.from_arrow(t), key="k", value_col="v"
    ).to_pandas()
    b = sketches.hll_distinct(
        ray.data.from_arrow(t).repartition(7), key="k", value_col="v"
    ).to_pandas()
    assert a["n_distinct_approx"].tolist() == b["n_distinct_approx"].tolist()


def test_bloom_anti_join_exact(ray_session):
    big = ray.data.from_arrow(
        pa.table({"id": pa.array(np.arange(5000, dtype=np.int64))})
    ).repartition(4)
    small = ray.data.from_arrow(
        pa.table({"id": pa.array(np.arange(0, 5000, 7, dtype=np.int64))})
    )
    out = sketches.bloom_anti_join(big, small, key="id").to_pandas()["id"]
    exp = [i for i in range(5000) if i % 7 != 0]
    assert sorted(out.tolist()) == exp


def test_bloom_anti_join_strings(ray_session):
    big = ray.data.from_arrow(
        pa.table({"id": pa.array([f"doc-{i}" for i in range(400)])})
    )
    small = ray.data.from_arrow(
        pa.table({"id": pa.array([f"doc-{i}" for i in range(0, 400, 5)])})
    )
    out = sketches.bloom_anti_join(big, small, key="id").to_pandas()["id"]
    assert sorted(out.tolist()) == sorted(
        f"doc-{i}" for i in range(400) if i % 5 != 0
    )
