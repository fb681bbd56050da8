"""Golden value-level checks for the multimodal feature family.

The three multimodal queries are rows-only under the DuckDB gate (binary
decode has no SQL mirror), so this is their value-level gate: the synthetic
BMP/PPM/WAV generators and the pure-numpy decode + feature kernels are
exactly deterministic, and these tests assert the full feature outputs are
bit-identical to the committed golden Parquet fixtures
(tests/fixtures/golden_{media,video_frame,audio_clip}_features.parquet,
regenerated only via tools/make_multimodal_golden.py).
"""
from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def _assert_tables_equal(current: pa.Table, golden: pa.Table) -> None:
    assert current.num_rows == golden.num_rows
    assert set(current.schema.names) == set(golden.schema.names)
    for name in golden.schema.names:
        cur = current[name].combine_chunks()
        gold = golden[name].combine_chunks()
        cur_type = cur.type
        if pa.types.is_fixed_size_list(cur_type) or pa.types.is_list(cur_type):
            cur_flat = np.concatenate(
                [np.asarray(v, dtype=np.float64) for v in cur.to_pylist()]
            ) if current.num_rows else np.array([])
            gold_flat = np.concatenate(
                [np.asarray(v, dtype=np.float64) for v in gold.to_pylist()]
            ) if golden.num_rows else np.array([])
            # bitwise equality: same container, same numpy, same kernels
            assert np.array_equal(cur_flat, gold_flat), f"column {name} drifted"
        else:
            assert cur.to_pylist() == gold.to_pylist(), f"column {name} drifted"


@pytest.fixture(scope="module")
def golden_tables(ray_session):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(FIXTURES), "..", "tools"))
    from tools.make_multimodal_golden import build_tables

    return build_tables()


@pytest.mark.parametrize(
    "name",
    ["golden_media_features", "golden_video_frame_features", "golden_audio_clip_features"],
)
def test_multimodal_matches_golden(golden_tables, name):
    golden = pq.read_table(os.path.join(FIXTURES, f"{name}.parquet"))
    _assert_tables_equal(golden_tables[name], golden)


def test_media_golden_covers_both_paths():
    """The media golden must exercise BOTH the real BMP decode and the
    declared stub path (mime split), or it's not testing the decode."""
    golden = pq.read_table(os.path.join(FIXTURES, "golden_media_features.parquet"))
    mimes = set(golden["mime"].to_pylist())
    assert "image/bmp" in mimes
    assert len(mimes) > 1
