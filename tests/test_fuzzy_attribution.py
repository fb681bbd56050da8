"""Round-3 fifth wave: fuzzy edit-distance pairs, per-group mode, MAD
stats, multi-touch attribution, JSON scalar extraction."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from hypertrace_ingester_ray.stages.analytics import (
    attribution,
    group_mode,
    mad_stats,
)
from hypertrace_ingester_ray.stages.fuzzy import (
    _prefix_matrix,
    fuzzy_pairs,
    levenshtein_pairs,
)


def _lev_ref(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_levenshtein_pairs_matches_scalar_dp():
    rng = np.random.default_rng(7)
    strs = [
        "".join(rng.choice(list("abcx "), size=rng.integers(0, 20)))
        for _ in range(80)
    ]
    mat, lens = _prefix_matrix(pa.array(strs), 20)
    ai = rng.integers(0, 80, 300)
    bi = rng.integers(0, 80, 300)
    got = levenshtein_pairs(mat[ai], mat[bi], lens[ai], lens[bi])
    for k in range(300):
        assert got[k] == _lev_ref(strs[ai[k]], strs[bi[k]])


def test_fuzzy_pairs_cross_bucket_dedup(ray_session):
    # n_chars 15 vs 17 straddle the band-16 bucket boundary; the pair must
    # appear exactly once (owned by the max home bucket)
    rows = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": ["hello world aaa", "hello world aaazz", "zzzzzzzz"],
            "n_chars": pa.array([15, 17, 8], pa.int64()),
        }
    )
    out = (
        fuzzy_pairs(
            ray.data.from_arrow(rows), band=16, prefix_len=24, max_dist=12
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert out.to_dict("records") == [{"doc_a": 1, "doc_b": 2, "dist": 2}]


def test_group_mode_tie_breaks_to_smallest_value(ray_session):
    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 1, 2], pa.int64()),
            "v": ["b", "b", "a", "a", "z"],
        }
    )
    out = (
        group_mode(ray.data.from_arrow(t), key="k", value_col="v")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out.to_dict("records") == [
        {"k": 1, "mode_value": "a", "n": 2},
        {"k": 2, "mode_value": "z", "n": 1},
    ]


def test_mad_stats_matches_numpy_lower_median(ray_session):
    rng = np.random.default_rng(11)
    keys = rng.choice(["a", "b"], size=400)
    vals = rng.normal(100, 30, size=400)
    t = pa.table({"k": keys, "value": vals})
    out = (
        mad_stats(ray.data.from_arrow(t), key="k", value_col="value")
        .to_pandas()
        .set_index("k")
    )

    def lower_median(x):
        x = np.sort(x)
        return x[(len(x) - 1) // 2]

    for k in ("a", "b"):
        cents = np.floor(vals[keys == k] * 100).astype(np.int64)
        med = lower_median(cents)
        mad = lower_median(np.abs(cents - med))
        row = out.loc[k]
        assert row["n"] == len(cents)
        assert row["median_cents"] == med
        assert row["mad_cents"] == mad
        assert row["n_outliers"] == int((np.abs(cents - med) > 3 * mad).sum())


def test_attribution_window_and_ties(ray_session):
    us = 1_000_000
    rows = [
        # user 1: touch at t=0 (view), t=10 (click), conversion at t=10
        (1, 0 * us, "view", 100),
        (1, 10 * us, "click", 101),
        (1, 10 * us, "purchase", 102),
        # user 1: second conversion at t=1000 — window 60s excludes both
        (1, 1000 * us, "purchase", 103),
        # user 2: two touches at the SAME ts — id breaks the tie
        (2, 5 * us, "view", 200),
        (2, 5 * us, "click", 201),
        (2, 6 * us, "purchase", 202),
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": [r[2] for r in rows],
            "event_id": pa.array([r[3] for r in rows], pa.int64()),
        }
    )
    out = (
        attribution(
            ray.data.from_arrow(t),
            user_col="user_id",
            ts_col="ts",
            type_col="event_type",
            id_col="event_id",
            conversion_type="purchase",
            touch_types=["view", "click"],
            window_us=60 * us,
        )
        .to_pandas()
        .set_index("channel")
    )
    # conv 102: first=view(100), last=click(101); conv 202: first=view(200,
    # same-ts tie → smaller id), last=click(201); conv 103: no touches
    assert out.loc["view"]["first_touch"] == 2
    assert out.loc["click"]["last_touch"] == 2
    assert out.loc["view"]["last_touch"] == 0
    assert out.loc["click"]["first_touch"] == 0
    # linear: each conversion had 2 touches → 500000 each
    assert out.loc["view"]["linear_micros"] == 1_000_000
    assert out.loc["click"]["linear_micros"] == 1_000_000


def test_extract_json_int_edge_cases():
    from hypertrace_ingester_ray.functions.maps import extract_json_int

    col = pa.chunked_array(
        [pa.array(['{"k": 69}', '{"k":-3}', '{"j": 1}', None, "{}"])]
    )
    got = extract_json_int(col, "k").to_pylist()
    assert got == [69, -3, None, None, None]
