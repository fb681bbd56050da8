"""Golden-file regression tests — the analog of the reference's whole-trace
golden enrichment assertion (StructuredTracesEnrichmentTest.java:118-134 with
after-enrichment.json fixtures): every routed sink of the sf0.001 run must
equal the committed golden Parquet, row for row, value for value."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from hypertrace_ingester_ray.pipelines.ingest import view_dataset

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

VIEWS = [
    "per_turn",
    "per_role",
    "per_conversation",
    "call_edges",
    "per_tool",
    "errors",
    "metrics",
]


import numpy as np


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    sortable = [
        c
        for c in df.columns
        if not df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any()
    ]
    return df.sort_values(sortable, kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("view", VIEWS)
def test_view_matches_golden(pipeline_out, view):
    out, _ = pipeline_out
    golden = pq.read_table(os.path.join(FIXTURES, f"golden_{view}.parquet")).to_pandas()
    current = view_dataset(out, view).to_pandas()
    assert sorted(current.columns) == sorted(golden.columns)
    pd.testing.assert_frame_equal(
        _canon(current)[sorted(current.columns)],
        _canon(golden)[sorted(golden.columns)],
        check_dtype=False,
    )
