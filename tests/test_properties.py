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
