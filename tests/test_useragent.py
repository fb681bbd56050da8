"""UA grammar parser tests (E11 depth): family precedence, OS/device
classification, robots/libraries, truncation, memo behavior."""

import pyarrow as pa

from hypertrace_ingester_ray.functions.useragent import (
    UA_FIELDS,
    UA_MAX_LENGTH,
    UserAgentParser,
    parse_ua,
)

CHROME_WIN = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36"
)


def test_chrome_windows():
    assert parse_ua(CHROME_WIN) == (
        "Chrome", "browser", "personal_computer", "Windows", "10.0", "120.0.0.0"
    )


def test_edge_takes_precedence_over_chrome():
    ua = CHROME_WIN + " Edg/120.0.2210.91"
    name, typ, dev, osn, osv, ver = parse_ua(ua)
    assert name == "Edge" and ver == "120.0.2210.91"


def test_opera_takes_precedence_over_chrome():
    assert parse_ua(CHROME_WIN + " OPR/106.0.0.0")[0] == "Opera"


def test_safari_needs_version_token():
    ua = (
        "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
        "(KHTML, like Gecko) Version/17.2 Safari/605.1.15"
    )
    assert parse_ua(ua) == (
        "Safari", "browser", "personal_computer", "Mac OS X", "10.15.7", "17.2"
    )


def test_android_mobile_vs_tablet():
    phone = (
        "Mozilla/5.0 (Linux; Android 13; Pixel 8) AppleWebKit/537.36 "
        "(KHTML, like Gecko) Chrome/120.0.0.0 Mobile Safari/537.36"
    )
    tablet = phone.replace(" Mobile", "")
    assert parse_ua(phone)[2] == "smartphone"
    assert parse_ua(tablet)[2] == "tablet"
    assert parse_ua(phone)[3:5] == ("Android", "13")


def test_iphone_is_smartphone():
    ua = (
        "Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) "
        "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 "
        "Mobile/15E148 Safari/604.1"
    )
    name, typ, dev, osn, osv, ver = parse_ua(ua)
    assert (dev, osn, osv) == ("smartphone", "iOS", "17.1")


def test_ie_trident():
    assert parse_ua("Mozilla/5.0 (Windows NT 6.1; Trident/7.0; rv:11.0) like Gecko") == (
        "Internet Explorer", "browser", "personal_computer", "Windows", "6.1", "11.0"
    )


def test_robot_and_library():
    assert parse_ua("Googlebot/2.1 (+http://www.google.com/bot.html)") == (
        "Googlebot", "robot", "robot", "unknown", "", "2.1"
    )
    assert parse_ua("curl/8.4.0") == ("curl", "library", "other", "unknown", "", "8.4.0")
    assert parse_ua("python-requests/2.31.0")[:2] == ("python-requests", "library")


def test_unknown_and_empty():
    assert parse_ua("") == ("unknown",) * 4 + ("", "")
    assert parse_ua("gibberish")[0] == "unknown"


def test_truncation_guard():
    # a valid prefix followed by garbage beyond the cap still parses from
    # the first UA_MAX_LENGTH chars (UserAgentParser.java:49-53 analog)
    ua = CHROME_WIN + " " + "x" * (2 * UA_MAX_LENGTH)
    assert parse_ua(ua)[0] == "Chrome"


def test_parse_column_unique_level_and_memo():
    p = UserAgentParser(max_size=10)
    col = pa.chunked_array([pa.array([CHROME_WIN, "curl/8.4.0", CHROME_WIN, None])])
    out = p.parse_column(col)
    assert out.schema.names == list(UA_FIELDS)
    assert out["ua_name"].to_pylist() == ["Chrome", "curl", "Chrome", None]
    assert len(p._memo) == 2
    # memo reset when the distinct-UA budget would overflow
    many = pa.array([f"agent{i}/1.0" for i in range(12)])
    p.parse_column(pa.chunked_array([many]))
    assert len(p._memo) <= 12
