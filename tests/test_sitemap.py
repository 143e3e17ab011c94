"""Sitemap-protocol parser unit tests (functions/sitemap.py) — pure
single-process, no Ray."""
import zlib
from datetime import date, datetime, timedelta, timezone

import pytest

from flink_fingerprint_ray.functions.sitemap import (
    build_sitemapindex,
    build_urlset,
    maybe_gunzip,
    parse_sitemap,
    parse_w3c_datetime_ms,
)


def test_w3c_datetime_variants():
    assert parse_w3c_datetime_ms("2024-01-01") == 1704067200000
    assert parse_w3c_datetime_ms("2024-01-01T12:30Z") == \
        1704067200000 + 45_000_000
    assert parse_w3c_datetime_ms("2024-01-01T12:30:05Z") == \
        1704067200000 + 45_005_000
    assert parse_w3c_datetime_ms("2024-01-01T12:30:05.25Z") == \
        1704067200000 + 45_005_250
    # +05:30 local is BEHIND UTC by the offset
    assert parse_w3c_datetime_ms("2024-01-01T12:30:00+05:30") == \
        1704067200000 + 45_000_000 - (5 * 3600 + 30 * 60) * 1000
    assert parse_w3c_datetime_ms("2024-01-01T12:30:00-02:00") == \
        1704067200000 + 45_000_000 + 2 * 3600 * 1000
    for bad in ("not-a-date", "2024-13-01", "2024-01-32", "20240101", ""):
        assert parse_w3c_datetime_ms(bad) is None


def test_days_from_civil_matches_datetime():
    d = date(1995, 1, 1)
    for step in range(0, 22000, 137):  # spans century/leap boundaries
        dd = d + timedelta(days=step)
        want = int(datetime(dd.year, dd.month, dd.day,
                            tzinfo=timezone.utc).timestamp() * 1000)
        got = parse_w3c_datetime_ms(dd.isoformat())
        assert got == want, dd


def test_urlset_roundtrip_plain_and_gzip_and_ns():
    urls = [
        {"loc": "https://h.example.com/a.html?x=1&y=2",
         "lastmod": "2024-03-05", "changefreq": "Daily", "priority": 0.8},
        {"loc": "https://h.example.com/b.html"},
        {"loc": "https://h.example.com/<odd>.html",
         "lastmod": "2024-03-05T06:07:08Z", "priority": 1.0},
    ]
    for gz in (False, True):
        for ns in (False, True):
            parsed = parse_sitemap(build_urlset(urls, gzip_out=gz,
                                                ns_prefix=ns))
            assert parsed["kind"] == "urlset"
            es = parsed["entries"]
            assert [e["loc"] for e in es] == [u["loc"] for u in urls]
            assert es[0]["lastmod_ms"] == parse_w3c_datetime_ms("2024-03-05")
            assert es[0]["changefreq"] == "daily"  # lowercased
            assert es[0]["priority"] == 0.8
            assert es[1]["lastmod_ms"] is None
            assert es[1]["changefreq"] is None and es[1]["priority"] is None
            assert es[2]["lastmod_ms"] == \
                parse_w3c_datetime_ms("2024-03-05T06:07:08Z")


def test_sitemapindex():
    payload = build_sitemapindex(
        ["https://h/sitemap-0.xml", "https://h/sitemap-1.xml.gz"],
        ["2024-02-01", None])
    parsed = parse_sitemap(payload)
    assert parsed["kind"] == "sitemapindex"
    assert [e["loc"] for e in parsed["entries"]] == \
        ["https://h/sitemap-0.xml", "https://h/sitemap-1.xml.gz"]
    assert parsed["entries"][0]["lastmod_ms"] == \
        parse_w3c_datetime_ms("2024-02-01")
    assert parsed["entries"][1]["lastmod_ms"] is None


def test_priority_clamp_and_invalid():
    xml = (b'<?xml version="1.0"?>'
           b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
           b"<url><loc>https://h/a</loc><priority>7</priority></url>"
           b"<url><loc>https://h/b</loc><priority>oops</priority></url>"
           b"<url><loc></loc></url>"  # empty loc dropped
           b"</urlset>")
    es = parse_sitemap(xml)["entries"]
    assert len(es) == 2
    assert es[0]["priority"] == 1.0  # clamped
    assert es[1]["priority"] is None


def test_malformed_and_nonsitemap_raise():
    with pytest.raises(ValueError):
        parse_sitemap(b"<urlset><url><loc>x</loc>")  # truncated
    with pytest.raises(ValueError):
        parse_sitemap(b"<html><body>404</body></html>")
    # corrupt gzip surfaces as zlib error (callers' on_error policy)
    with pytest.raises(Exception):
        parse_sitemap(b"\x1f\x8b\x00garbage")


def test_maybe_gunzip_passthrough():
    assert maybe_gunzip(b"<urlset/>") == b"<urlset/>"
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    gz = co.compress(b"payload") + co.flush()
    assert maybe_gunzip(gz) == b"payload"
