"""Edge-input contract: representative operators from every family must
accept (a) zero-row tables and (b) null-injected tables without crashing
(README "Edge-input contract"; fixtures mirror tools/make_edge_fixtures.py).

The full 135-query sweep lives in tools/fuzz_edges.py; this test pins one
query per fixed family so regressions surface in CI time, not fuzz time.
"""
import sys

import pytest

sys.path.insert(0, "/root/repo")

import tools.make_edge_fixtures as mef

# one per hardening family: flagship views, text scoring, tokenize/pack,
# sampling, ranking, windows/watermarks, native-groupby null keys, sketches,
# attribution, layouts (SMB/zorder), similarity, embedding dedup,
# relational groupby/join with nullable TPC-H measure+label columns
REPRESENTATIVE = [
    "view_per_turn",
    "lineitem_pricing_summary",
    "order_priority_revenue",
    "doc_quality",
    "doc_bm25_top10",
    "doc_pack_sequences",
    "doc_stratified_sample",
    "doc_length_rank",
    "events_sliding_1h",
    "trending_types_hourly",
    "approx_users_by_type",
    "touch_attribution",
    "event_value_winsorized",
    "smb_user_stats",
    "events_zorder_scan",
    "knn_cosine_top5",
    "embedding_semantic_dedup",
]


@pytest.fixture(scope="module")
def edge_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("edge_fixtures")
    out_e, out_n = mef.build("/root/testdata/sf0.001", str(root))
    return out_e, out_n


def _queries():
    import __ray_entry__ as entry

    return entry.queries()


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_zero_row_input(ray_session, edge_dirs, name):
    out = _queries()[name](edge_dirs[0])
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    assert len(out) == 0 or name == "docs_profile"


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_null_injected_input(ray_session, edge_dirs, name):
    out = _queries()[name](edge_dirs[1])
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    # no crash is the contract; row counts vary by operator semantics
    assert len(out) >= 0
