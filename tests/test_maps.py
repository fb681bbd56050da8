"""Map-column operator tests (TagsFilter / attribute-map analogs)."""

import pyarrow as pa

from hypertrace_ingester_ray.functions.maps import (
    filter_map_keys,
    lowercase_map_keys,
    map_get,
)


def _maps(rows):
    return pa.chunked_array(
        [pa.array(rows, pa.map_(pa.string(), pa.string()))]
    )


def test_lowercase_keys():
    col = _maps([[("Foo", "1"), ("BAR", "2")], []])
    out = lowercase_map_keys(col)
    assert out.to_pylist() == [[("foo", "1"), ("bar", "2")], []]


def test_filter_denied_prefix_with_allow_list():
    col = _maps(
        [
            [("http.url", "u"), ("http.secret", "s"), ("grpc.code", "0")],
            [("http.method", "GET")],
            [],
        ]
    )
    out = filter_map_keys(
        col, denied_prefixes=["http."], allow_list=["http.url"]
    )
    assert out.to_pylist() == [
        [("http.url", "u"), ("grpc.code", "0")],
        [],
        [],
    ]


def test_map_get_first_match_and_nulls():
    col = _maps(
        [
            [("a", "1"), ("b", "2"), ("a", "dup")],
            [("b", "3")],
            [],
        ]
    )
    out = map_get(col, "a")
    assert out.to_pylist() == ["1", None, None]
