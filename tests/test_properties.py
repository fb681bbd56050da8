"""Property-based tests (hypothesis) for the core invariants."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from hypertrace_ingester_ray.stages.grouping import (
    assemble_conversations,
    run_boundaries,
    segment_ids_from_boundaries,
    segmented_cumcount,
)
from hypertrace_ingester_ray.stages.normalize import GROK_PATTERN, extract_batch


@given(st.lists(st.integers(0, 5), min_size=0, max_size=200))
@settings(max_examples=50, deadline=None)
def test_segment_helpers_invariants(vals):
    a = np.array(sorted(vals), dtype=np.int64)
    b = run_boundaries(a) if len(a) else np.array([0])
    # boundaries cover the array exactly, strictly increasing
    assert b[0] == 0 and b[-1] == len(a)
    assert (np.diff(b) > 0).all() or len(a) == 0
    seg = segment_ids_from_boundaries(b)
    assert len(seg) == len(a)
    if len(a):
        # same segment ⇔ same value
        assert len(np.unique(seg)) == len(np.unique(a))
        cc = segmented_cumcount(seg)
        assert cc[b[:-1]].max(initial=0) == 0  # every segment restarts at 0


turns = st.lists(
    st.tuples(
        st.integers(0, 4),          # conv
        st.integers(0, 30),         # turn_idx (duplicates likely)
        st.integers(0, 10_000),     # ts
    ),
    min_size=0,
    max_size=300,
)


@given(turns, st.integers(1, 20))
@settings(max_examples=40, deadline=None)
def test_assemble_invariants(rows, cap):
    t = pa.table(
        {
            "conv_id": pa.array([f"c{r[0]}" for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        }
    ).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending"), ("ts", "ascending")]
    )
    out, n_dedup, n_capped = assemble_conversations(t, max_turns_per_conv=cap)
    df = out.to_pandas()
    # no duplicate (conv, turn_idx); per-conv size ≤ cap; totals account
    assert not df.duplicated(["conv_id", "turn_idx"]).any()
    assert (df.groupby("conv_id").size() <= cap).all()
    assert len(df) + n_dedup + n_capped == len(rows)
    # keep-first: for each (conv, turn), the surviving ts is the minimum of
    # that key's candidates (ties on full sort order)
    if len(rows):
        import pandas as pd

        raw = t.to_pandas()
        first = raw.groupby(["conv_id", "turn_idx"], as_index=False).ts.min()
        merged = df.merge(first, on=["conv_id", "turn_idx"], suffixes=("", "_min"))
        assert (merged.ts == merged.ts_min).all()


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["GET", "POST", "PUT"]),
            st.sampled_from(["click", "view", "error"]),
            st.integers(0, 99),
            st.integers(100, 599),
            st.integers(0, 10**6),
            st.integers(0, 4095),
        ),
        min_size=1,
        max_size=100,
    )
)
@settings(max_examples=40, deadline=None)
def test_grok_round_trip(fields):
    """text built from fields → extract_batch recovers every field."""
    texts = [
        f"{m} /api/v1/{op}/{k} HTTP/1.1 status={s} dur_ms={d} bytes={b}"
        for m, op, k, s, d, b in fields
    ]
    batch = pa.table(
        {
            "tenant_id": pa.array(["t"] * len(texts), pa.string()),
            "conv_id": pa.array(["c"] * len(texts), pa.string()),
            "turn_idx": pa.array(range(len(texts)), pa.int32()),
            "role": pa.array(["user"] * len(texts), pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array([None] * len(texts), pa.string()),
            "ts": pa.array(range(len(texts)), pa.timestamp("us")),
        }
    )
    out = extract_batch(batch)
    assert out["http_method"].to_pylist() == [f[0] for f in fields]
    assert out["op"].to_pylist() == [f[1] for f in fields]
    assert out["status_code"].to_pylist() == [f[3] for f in fields]
    assert out["dur_ms"].to_pylist() == [f[4] for f in fields]
    assert out["bytes"].to_pylist() == [f[5] for f in fields]
    assert out["is_error"].to_pylist() == [f[3] >= 400 for f in fields]


@given(
    st.lists(
        st.text(alphabet="abcde ", min_size=0, max_size=40), min_size=1, max_size=20
    )
)
@settings(max_examples=50, deadline=None)
def test_shingle_hashes_properties(texts):
    """Vectorized shingling: per-doc counts match the scalar definition and
    identical docs share identical shingle sequences."""
    import numpy as np
    import pyarrow as pa

    from hypertrace_ingester_ray.functions.hashing import shingle_hashes

    k = 3
    sh, soff = shingle_hashes(pa.array(texts, pa.string()), k)
    assert len(soff) == len(texts) + 1
    for i, t in enumerate(texts):
        words = t.split(" ")
        expect = max(len(words) - k + 1, 1)
        assert soff[i + 1] - soff[i] == expect
    # identical docs → identical shingle slices
    for i, a in enumerate(texts):
        for j, b in enumerate(texts):
            if a == b:
                assert np.array_equal(
                    sh[soff[i]:soff[i + 1]], sh[soff[j]:soff[j + 1]]
                )


@given(
    st.lists(st.integers(-10_000, 10_000), min_size=1, max_size=300),
    st.lists(st.integers(0, 3), min_size=1, max_size=300),
    st.integers(0, 40),
)
@settings(max_examples=60, deadline=None)
def test_rolling_minmax_rmq_property(values, keys, window):
    """The sparse-table RMQ rolling min equals pandas' brute-force frame min
    for arbitrary values, group layouts and window widths (the exact kernel
    math from analytics.window_functions, exercised without a Ray session)."""
    import numpy as np
    import pandas as pd

    from hypertrace_ingester_ray.stages.grouping import run_boundaries

    n = min(len(values), len(keys))
    pdf = pd.DataFrame(
        {
            "k": np.array(keys[:n], dtype=np.int64),
            "ord": np.arange(n, dtype=np.int64),
            "v": np.array(values[:n], dtype=np.int64),
        }
    ).sort_values(["k", "ord"], kind="mergesort").reset_index(drop=True)

    # expectation: pandas rolling over the sorted frame (groups contiguous,
    # group-major order == row order)
    exp = (
        pdf.groupby("k", sort=False)["v"]
        .rolling(window + 1, min_periods=1)
        .min()
        .reset_index(level=0, drop=True)
        .astype("int64")
        .tolist()
    )

    karr = pdf["k"].to_numpy()
    v = pdf["v"].to_numpy()
    nrows = len(pdf)
    bounds = run_boundaries(karr)
    idx = np.arange(nrows, dtype=np.int64)
    seg_start = np.repeat(bounds[:-1], np.diff(bounds))
    w = np.maximum(idx - window, seg_start)
    red = np.minimum
    levels = [v]
    span = 1
    while span * 2 <= window + 1 and span * 2 <= nrows:
        prev = levels[-1]
        levels.append(red(prev[:-span], prev[span:]))
        span *= 2
    length = idx - w + 1
    kk = np.zeros(nrows, dtype=np.int64)
    step = 1
    for lv in range(1, len(levels)):
        kk[length >= step * 2] = lv
        step *= 2
    half = np.int64(1) << kk
    got = np.empty(nrows, dtype=v.dtype)
    for lv, tab in enumerate(levels):
        m = kk == lv
        if m.any():
            got[m] = red(tab[w[m]], tab[idx[m] - half[m] + 1])
    assert got.tolist() == exp


@given(
    st.lists(
        st.text(alphabet="abc ", min_size=0, max_size=30),
        min_size=0,
        max_size=25,
    ),
    st.integers(2, 6),
)
@settings(max_examples=40, deadline=None)
def test_char_shingle_hashes_properties(texts, k):
    """char_shingle_hashes invariants: per-doc gram counts are
    max(len-k+1, 0); equal substrings hash equally across docs; offsets
    monotone; sliced arrays match unsliced."""
    import pyarrow as pa

    from hypertrace_ingester_ray.functions.hashing import char_shingle_hashes

    arr = pa.array(texts, pa.string())
    sh, off = char_shingle_hashes(arr, k)
    assert len(off) == len(texts) + 1
    assert off[0] == 0 and off[-1] == len(sh)
    for i, t in enumerate(texts):
        n_bytes = len(t.encode())
        assert off[i + 1] - off[i] == max(n_bytes - k + 1, 0), (i, t)
    # value consistency: same gram text => same hash (cross-doc)
    gram_of = {}
    for i, t in enumerate(texts):
        b = t.encode()
        for j in range(max(len(b) - k + 1, 0)):
            g = b[j : j + k]
            h = sh[off[i] + j]
            if g in gram_of:
                assert gram_of[g] == h, (g, i, j)
            gram_of[g] = h
    if len(texts) > 1:
        sh2, off2 = char_shingle_hashes(pa.array(texts).slice(1), k)
        assert (sh2 == sh[off[1]:]).all()
