"""Unit tests for the pure fingerprint/window/expr kernels (no Ray)."""

import numpy as np
import pyarrow as pa
import pytest

from flink_fingerprint_ray.functions import fingerprint as fp
from flink_fingerprint_ray.functions.exprs import add_derived_columns, compile_expr
from flink_fingerprint_ray.stages.windows import (
    compute_stats,
    fingerprint_id,
    sessionize_sorted,
    sliding_window_starts,
    tumbling_window_start,
)


def test_extract_inverts_wrap():
    texts = ["hello world", "a <b> & c", "", "tokens with  spaces", "äöü 中文"]
    html = pa.array([fp.wrap_html(t) for t in texts], pa.binary())
    out = fp.extract_text(html).to_pylist()
    assert out == texts  # byte-identical per BASELINE.json input_hint


def test_extract_malformed_html_empty():
    html = pa.array([b"<html>no paragraph</html>", b"garbage"], pa.binary())
    assert fp.extract_text(html).to_pylist() == ["", ""]


def test_host_of():
    urls = pa.array(
        ["https://a.example.com/x/y", "http://b.org", "c.net/path", "ftp://d.io/"]
    )
    assert fp.host_of(urls).to_pylist() == ["a.example.com", "b.org", "c.net", "d.io"]


def test_hash_determinism_across_calls():
    t = pa.array(["the quick brown fox jumps over the lazy dog"] * 3)
    a, b = fp.simhash(t), fp.simhash(t)
    assert (a == b).all() and len(set(a.tolist())) == 1
    m1, m2 = fp.minhash(t), fp.minhash(t)
    assert (m1 == m2).all()


def test_polars_self_heal_rebinds_broken_import_chain():
    """A transiently failed first `import polars` in a worker leaves
    polars._utils.wrap bound to a dead _reexport module; every wrap_s then
    raises AttributeError forever in that process.  _polars() must detect
    the broken chain via its end-to-end probe, purge sys.modules, and
    re-import a working module — with the token hash unchanged."""
    before = fp.hash_fingerprint()
    h_before, _ = fp._tokenize(pa.array(["a b c"], pa.large_string()))

    import polars._utils.wrap as w

    class _DeadReexport:  # what wrap sees after a failed-then-retried import
        pass

    w.pl = _DeadReexport()
    fp._PL = None  # force a fresh probe, as a new worker process would
    with pytest.raises(AttributeError):
        import polars as pl_broken

        pl_broken.from_arrow(pa.array(["x"], pa.large_string())).hash(seed=0)

    healed = fp._polars()
    h_after, n = fp._tokenize(pa.array(["a b c"], pa.large_string()))
    assert (h_after == h_before).all() and n.tolist() == [3]
    assert fp.hash_fingerprint() == before
    # the healed module really is a fresh, correctly-bound chain
    healed.from_arrow(pa.array(["x"], pa.large_string())).hash(seed=0)


def test_minhash_jaccard_estimate():
    base = "w%d " * 100
    t1 = base % tuple(range(100))
    t2 = base % tuple(list(range(95)) + [900, 901, 902, 903, 904])  # ~95% shared shingles
    t3 = ("z%d " * 100) % tuple(range(1000, 1100))
    sig = fp.minhash(pa.array([t1, t2, t3]))
    est_near = fp.jaccard_from_minhash(sig[0], sig[1])
    est_far = fp.jaccard_from_minhash(sig[0], sig[2])
    assert est_near > 0.6
    assert est_far < 0.2


def test_simhash_hamming_property():
    toks = [f"tok{i}" for i in range(200)]
    t1 = " ".join(toks)
    toks[7] = "CHANGED"
    t2 = " ".join(toks)
    t3 = " ".join(f"other{i}" for i in range(200))
    sh = fp.simhash(pa.array([t1, t2, t3]))
    near = fp.hamming64(sh[0:1], sh[1:2])[0]
    far = fp.hamming64(sh[0:1], sh[2:3])[0]
    assert near < 12 < far


def test_simhash_bands_pigeonhole():
    sh = np.array([0x0123456789ABCDEF, 0x0123456789ABCDEC], dtype=np.uint64)  # hamming 2
    bands = fp.simhash_bands(sh, n_bands=4)
    assert (bands[0] == bands[1]).sum() >= 1  # hamming < n_bands → share a band


def test_empty_and_short_docs():
    t = pa.array(["", "one two", "one two three four"])
    sig = fp.minhash(t)
    assert (sig[0] == np.iinfo(np.uint32).max).all()  # sentinel
    assert (sig[1] == np.iinfo(np.uint32).max).all()  # < 3 tokens
    assert not (sig[2] == np.iinfo(np.uint32).max).all()
    sh = fp.simhash(t)
    assert sh[0] == 0 and sh[1] == 0 and sh[2] != 0


# -- windows ----------------------------------------------------------------

def test_tumbling_boundary_exclusive():
    # ts == window_end belongs to the NEXT window ([start, end) semantics,
    # reference join predicate save_fingerprints.py:148)
    ts = np.array([0, 59_999, 60_000, 119_999, 120_000], dtype=np.int64)
    ws = tumbling_window_start(ts, 60_000)
    assert ws.tolist() == [0, 0, 60_000, 60_000, 120_000]


def test_sliding_explode():
    ts = np.array([150_000], dtype=np.int64)  # size 120s, slide 60s → 2 windows
    take, starts = sliding_window_starts(ts, 120_000, 60_000)
    assert take.tolist() == [0, 0]
    assert sorted(starts.tolist()) == [60_000, 120_000]
    for s in starts:
        assert s <= 150_000 < s + 120_000


def test_sliding_requires_divisible():
    with pytest.raises(ValueError):
        sliding_window_starts(np.array([0]), 100, 33)


def test_sessionize():
    ts = np.array([0, 10, 20, 100, 105, 300], dtype=np.int64)
    sid = sessionize_sorted(ts, gap_ms=50)
    assert sid.tolist() == [0, 0, 0, 1, 1, 2]
    # gap exactly == threshold does NOT break (strict >)
    assert sessionize_sorted(np.array([0, 50]), 50).tolist() == [0, 0]
    assert sessionize_sorted(np.array([0, 51]), 50).tolist() == [0, 1]


def test_compute_stats_reference_parity():
    # reference: statistics.mean/median/pstdev with n==1 → std 0.0
    # (src/flink_job/aggregations.py:6-16)
    import statistics

    vals = [3.0, 1.0, 2.0, 2.0, 5.0]
    s = compute_stats(np.array(vals))
    assert s["min"] == 1.0 and s["max"] == 5.0
    assert s["median"] == statistics.median(vals)
    assert s["mean"] == pytest.approx(statistics.mean(vals))
    assert s["std_dev"] == pytest.approx(statistics.pstdev(vals))
    one = compute_stats(np.array([7.0]))
    assert one["std_dev"] == 0.0 and one["median"] == 7.0


def test_fingerprint_id_deterministic():
    a = fingerprint_id("en", "h.com", "tumbling", 0, 60_000)
    b = fingerprint_id("en", "h.com", "tumbling", 0, 60_000)
    c = fingerprint_id("en", "h.com", "tumbling", 60_000, 120_000)
    assert a == b != c and len(a) == 32


# -- expression compiler ----------------------------------------------------

def test_expr_compiler_matches_numpy():
    t = pa.table({"x": pa.array([1.0, 4.0, 9.0]), "y": pa.array([2.0, 3.0, 4.0])})
    out = add_derived_columns(t, {"z": "sqrt(x) + y * 2.0", "w": "log(x + 1.0)"})
    np.testing.assert_allclose(out["z"].to_numpy(), np.sqrt([1, 4, 9]) + np.array([2, 3, 4]) * 2)
    np.testing.assert_allclose(out["w"].to_numpy(), np.log(np.array([1, 4, 9]) + 1))


def test_expr_compiler_rejects_unsafe():
    for bad in ("__import__('os')", "x.attr", "open('f')", "[1,2]", "x if y else 0"):
        with pytest.raises(ValueError):
            compile_expr(bad)


# ---------------------------------------------------------------------------
# Rule DSL (functions/rules.py — reference ops_map, helpers.py:47-60)
# ---------------------------------------------------------------------------

def test_rule_ops_and_logic():
    import numpy as np
    import pandas as pd

    from flink_fingerprint_ray.functions.rules import evaluate_rule, evaluate_rules

    df = pd.DataFrame({
        "a": [1.0, 5.0, -7.0, np.nan, 3.0],
        "b": [10.0, 2.0, 3.0, 4.0, np.nan],
    })
    assert evaluate_rule(df, {"id": "x", "logic": "AND", "checks": [
        {"param": "a", "op": ">", "value": 0.0},
        {"param": "b", "op": "<=", "value": 10.0},
    ]}).tolist() == [True, True, False, False, False]  # NaN never triggers
    assert evaluate_rule(df, {"id": "x", "logic": "OR", "checks": [
        {"param": "a", "op": "abs_gt", "value": 6.0},
        {"param": "b", "op": "between", "value": [9.0, 11.0]},
    ]}).tolist() == [True, False, True, False, False]
    assert evaluate_rule(df, {"id": "x", "logic": "AND", "checks": [
        {"param": "a", "op": "outside", "value": [0.0, 4.0]},
    ]}).tolist() == [False, True, True, False, False]
    # deviation with a column base (helpers.py:378-383)
    assert evaluate_rule(df, {"id": "x", "logic": "AND", "checks": [
        {"param": "a", "op": "deviation", "base": "b", "value": 5.0},
    ]}).tolist() == [True, False, True, False, False]
    # IF/THEN/ELSE
    r = evaluate_rule(df, {"id": "x", "logic": "IF",
                           "if": [{"param": "a", "op": ">", "value": 2.0}],
                           "then": [{"param": "b", "op": "<", "value": 3.0}],
                           "else": [{"param": "b", "op": ">", "value": 5.0}]})
    assert r.tolist() == [True, True, False, False, False]
    # missing param never triggers; == / !=
    assert evaluate_rule(df, {"id": "x", "logic": "AND", "checks": [
        {"param": "zzz", "op": ">", "value": 0.0}]}).tolist() == [False] * 5
    out = evaluate_rules(df, [
        {"id": "eq", "logic": "AND", "checks": [{"param": "a", "op": "==", "value": 5.0}]},
        {"id": "ne", "logic": "AND", "checks": [{"param": "a", "op": "!=", "value": 5.0}]},
    ])
    assert out["eq"].tolist() == [False, True, False, False, False]
    assert out["ne"].tolist() == [True, False, True, False, True]
    # value-as-column-name threshold (helpers.py:397-400): a > b row-wise,
    # NaN on either side never triggers; unknown column never triggers
    assert evaluate_rule(df, {"id": "x", "logic": "AND", "checks": [
        {"param": "a", "op": ">", "value": "b"}]}).tolist() == \
        [False, True, False, False, False]
    assert evaluate_rule(df, {"id": "x", "logic": "AND", "checks": [
        {"param": "a", "op": "<=", "value": "b"}]}).tolist() == \
        [True, False, True, False, False]
    assert evaluate_rule(df, {"id": "x", "logic": "AND", "checks": [
        {"param": "a", "op": ">", "value": "zzz"}]}).tolist() == [False] * 5


def test_duration_alarms_streak_gate():
    """Reference semantics (process_odr.py:269-303): one alarm per
    continuous streak, fired when the accumulated step sum reaches
    max(duration_s); step = delta to the previous present row, first row
    of a key uses row_duration."""
    import pandas as pd

    from flink_fingerprint_ray.functions.rules import duration_alarms

    # key 1: ts 0,60,120,180 all triggering -> streak 60,120,180,240
    # key 2: trigger at 0 and 60, gap (false) at 120, trigger 180,240
    df = pd.DataFrame({
        "k": [1, 1, 1, 1, 2, 2, 2, 2, 2],
        "ts": [0, 60_000, 120_000, 180_000, 0, 60_000, 120_000, 180_000, 240_000],
        "x": [9.0, 9.0, 9.0, 9.0, 9.0, 9.0, 1.0, 9.0, 9.0],
    })
    rules = [{"id": "r120", "logic": "AND", "checks": [
        {"param": "x", "op": ">", "value": 5.0, "duration_s": 120}]}]
    out = duration_alarms(df, rules, ["k"], "ts", 60_000)
    # key 1: streak 60(row0),120(row1) -> crossing at ts=60000
    # key 2: first streak 60,120 -> ts=60000; second streak starts at
    # ts=180000 with step 60000 (delta from the FALSE row), 120000 at
    # ts=240000 -> crossing at 240000
    got = sorted(zip(out["k"], out["ts"]))
    assert got == [(1, 60_000), (2, 60_000), (2, 240_000)]

    # duration 0: one alarm at the FIRST row of each streak
    rules0 = [{"id": "r0", "logic": "AND", "checks": [
        {"param": "x", "op": ">", "value": 5.0, "duration_s": 0}]}]
    out0 = duration_alarms(df, rules0, ["k"], "ts", 60_000)
    assert sorted(zip(out0["k"], out0["ts"])) == [(1, 0), (2, 0), (2, 180_000)]

    # a streak that never reaches the duration emits nothing
    rules_long = [{"id": "rlong", "logic": "AND", "checks": [
        {"param": "x", "op": ">", "value": 5.0, "duration_s": 600}]}]
    assert len(duration_alarms(df, rules_long, ["k"], "ts", 60_000)) == 0

    # irregular cadence: a 10-min gap inside a streak counts as its step
    df2 = pd.DataFrame({"k": [1, 1], "ts": [0, 600_000], "x": [9.0, 9.0]})
    out2 = duration_alarms(df2, rules_long, ["k"], "ts", 60_000)
    assert sorted(zip(out2["k"], out2["ts"])) == [(1, 600_000)]


def test_rule_overrides():
    from flink_fingerprint_ray.functions.rules import apply_overrides

    rules = [{"id": "r1", "logic": "AND", "checks": [
        {"param": "a", "op": ">", "value": 10.0},
        {"param": "b", "op": "<", "value": 5.0},
    ]}, {"id": "r2", "logic": "IF",
         "if": [{"param": "a", "op": ">", "value": 1.0}],
         "then": [{"param": "b", "op": ">", "value": 2.0}],
         "else": [{"param": "b", "op": "<", "value": 0.0}]}]
    out = apply_overrides(rules, [
        {"rule_id": "r1", "param": "a", "op": ">", "value": 99.0},
        {"rule_id": "r2", "param": "b", "op": ">", "value": 7.0, "new_op": ">="},
    ])
    assert out[0]["checks"][0]["value"] == 99.0
    assert out[0]["checks"][1]["value"] == 5.0      # untouched
    assert rules[0]["checks"][0]["value"] == 10.0   # input not mutated
    assert out[1]["then"][0] == {"param": "b", "op": ">=", "value": 7.0}


def test_lowess_smooth_kernel():
    """M7 analog (Cleveland LOWESS): constant series unchanged, noisy
    line recovered, single outlier suppressed by the robustness passes."""
    import numpy as np

    from flink_fingerprint_ray.functions.smooth import lowess_smooth, lowess_smooth_df

    # constant series -> exactly constant
    c = np.full(50, 3.25)
    assert np.allclose(lowess_smooth(c, frac=0.3), c)

    # noisy line: smoothed curve much closer to the line than the noise
    rng = np.random.RandomState(0)
    x = np.arange(200, dtype=float)
    line = 0.5 * x + 2.0
    noisy = line + rng.normal(0, 3.0, size=200)
    sm = lowess_smooth(noisy, frac=0.15)
    assert np.abs(sm - line).mean() < 0.5 * np.abs(noisy - line).mean()

    # robustness: one huge outlier barely moves the fit at its position
    y = line.copy()
    y[100] += 500.0
    sm_r = lowess_smooth(y, frac=0.15, it=3)
    assert abs(sm_r[100] - line[100]) < 5.0

    # df wrapper: skips non-numeric, propagates NaN, needs >=3 finite
    import pandas as pd
    df = pd.DataFrame({"a": noisy, "b": ["x"] * 200, "c": [np.nan] * 200})
    out = lowess_smooth_df(df, window_points=30, exclude_cols=[])
    assert (out["b"] == "x").all()
    assert out["c"].isna().all()
    assert np.abs(out["a"].to_numpy() - line).mean() < np.abs(noisy - line).mean()


def test_url_canonicalize_kernel():
    from flink_fingerprint_ray.functions.url import canonicalize_batch

    t = pa.table({"url": pa.array([
        "HTTP://WWW.Example.COM:80/a/b/../c/./page.html?b=2&utm_source=f&a=1#x",
        "https://News.example.org:443/",
        "https://sub.site.net:8080/x?id=9&a=3&fbclid=zz",
        "http://example.com",                       # no path -> '/'
        "https://www.foo.bar/p/q/../../r?utm_campaign=x&ref=home",
        "https://a.b/x/./././y/../z/.",             # stacked dot segments
        "HTTPS://Host.TLD/path?gclid=1&Z=2&a=10&a=2",  # dup keys kept, sorted
    ])})
    out = canonicalize_batch(t).to_pylist()
    got = [(r["canon_url"], r["surt_key"]) for r in out]
    assert got == [
        ("http://www.example.com/a/c/page.html?a=1&b=2",
         "com,example)/a/c/page.html?a=1&b=2"),
        ("https://news.example.org/", "org,example,news)/"),
        ("https://sub.site.net:8080/x?a=3&id=9", "net,site,sub)/x?a=3&id=9"),
        ("http://example.com/", "com,example)/"),
        ("https://www.foo.bar/r", "bar,foo)/r"),
        ("https://a.b/x/z/", "b,a)/x/z/"),
        ("https://host.tld/path?Z=2&a=10&a=2", "tld,host)/path?Z=2&a=10&a=2"),
    ]


def test_html_extract_general_adversarial():
    from flink_fingerprint_ray.functions.html import (
        extract_text_general, link_density)

    col = pa.array([
        # script body with <, >, && and a fake closing tag in a string
        '<head><script>if(a<b&&c>d){x="</p>";}</script></head><p>keep</p>',
        # quoted '>' inside attribute
        '<div data-x="a>b">inner</div>',
        # comment hiding tags and entities
        '<!-- <p>ghost &amp; gone</p> --><p>real</p>',
        # numeric decimal + hex refs, double-escaped amp stays literal
        '<p>&#65;&#x42; &amp;#67; &amp;copy;</p>',
        # nbsp + named set
        '<p>a&nbsp;b &lt;tag&gt; &quot;q&quot;</p>',
        # block soup collapses to single newlines; inline tags vanish
        '<ul><li>one</li><li><b>two</b></li></ul><table><tr><td>x</td>'
        '<td>y</td></tr></table>',
        # empty / whitespace-only
        '<div>   </div>',
        # unclosed tag tail survives as text (malformed input)
        '<p>ok</p><p>trailing',
    ])
    got = extract_text_general(col).to_pylist()
    assert got == [
        "keep",
        "inner",
        "real",
        "AB &#67; &copy;",
        'a b <tag> "q"',
        "one\ntwo\nx\ny",
        "",
        "ok\ntrailing",
    ]
    # anchors: 6 chars of link text out of 10 total ('menu12 body')
    ld = link_density(pa.array([
        '<nav><a href="/">menu12</a></nav><p>body</p>',
        '<p>no links</p>',
        '',
    ])).to_pylist()
    assert abs(ld[0] - 6 / 11) < 1e-12
    assert ld[1] == 0.0 and ld[2] == 0.0


def test_robots_rfc9309_semantics():
    from flink_fingerprint_ray.functions.robots import parse_robots, robots_allowed

    body = (
        "# comment line\n"
        "User-agent: evilbot\nDisallow: /\n\n"
        "User-agent: a\nUser-agent: b\nDisallow: /shared/\n\n"
        "User-agent: *\n"
        "Disallow: /p3/   # trailing comment\n"
        "Allow: /p3/item5.html\n"
        "Disallow: /a/x/\n"
        "Disallow:\n"          # empty disallow = allow-all, no rule
        "Crawl-delay: 2\n"     # non-rule directive ignored
    )
    rules = parse_robots(["h1"], [body])
    got = sorted(zip(rules["prefix"], rules["allow"]))
    assert got == [("/a/x/", False), ("/p3/", False), ("/p3/item5.html", True)]

    paths = pa.array(["/p3/item1.html", "/p3/item5.html", "/a/b",
                      "/a/x/deep", "/", "/p4/x"])
    ok = robots_allowed(rules, ["h1"] * 6, paths)
    assert list(ok) == [False, True, True, False, True, True]

    # exact agent group wins over '*'; consecutive UA lines share a group
    r_evil = parse_robots(["h1"], [body], agent="evilbot")
    assert list(robots_allowed(r_evil, ["h1"], pa.array(["/any"]))) == [False]
    r_b = parse_robots(["h1"], [body], agent="b")
    assert list(robots_allowed(
        r_b, ["h1", "h1"], pa.array(["/shared/x", "/p3/y"]))) == [False, True]

    # rules scoped per host: h2's rules never leak onto h1
    r2 = parse_robots(["h1", "h2"], ["User-agent: *\nAllow: /\n",
                                     "User-agent: *\nDisallow: /\n"])
    assert list(robots_allowed(r2, ["h1", "h2"],
                               pa.array(["/x", "/x"]))) == [True, False]


def test_charset_kernels_match_python_decoder():
    """Vectorized RFC 3629 validity + Latin-1 byte-surgery transcode vs
    Python's own codecs over edge cases and random blobs."""
    import random

    from flink_fingerprint_ray.functions.charset import (
        decode_with_fallback, latin1_to_utf8, utf8_valid_mask)

    random.seed(17)
    cases = [
        b"plain ascii", "naïve café".encode(), "café".encode("latin-1"),
        b"", b"\xc0\xaf", b"\xc1\xbf",            # overlong 2-byte
        b"\xed\xa0\x80", b"\xed\x9f\xbf",          # surrogate edge
        b"\xf4\x90\x80\x80", b"\xf4\x8f\xbf\xbf",  # > / == U+10FFFF
        b"\xe0\x9f\xbf", b"\xe0\xa0\x80",          # overlong 3-byte edge
        b"\xf0\x8f\xbf\xbf", b"\xf0\x90\x80\x80",  # overlong 4-byte edge
        b"truncated \xe2\x82", b"orphan \x80", b"\xff\xfe",
        "𝄞 music".encode(), b"\xe2\x82\xac ok",
    ]
    for _ in range(500):
        cases.append(bytes(random.getrandbits(8)
                           for _ in range(random.randint(0, 16))))
    col = pa.array(cases, pa.binary())
    want_valid = []
    for c in cases:
        try:
            c.decode("utf-8")
            want_valid.append(True)
        except UnicodeDecodeError:
            want_valid.append(False)
    assert list(utf8_valid_mask(col)) == want_valid
    assert latin1_to_utf8(pa.array([bytes(range(256))], pa.binary())) \
        .to_pylist() == [bytes(range(256)).decode("latin-1")]
    cs, txt = decode_with_fallback(col)
    assert txt.to_pylist() == [
        c.decode("utf-8") if v else c.decode("latin-1")
        for c, v in zip(cases, want_valid)]
    assert cs.to_pylist() == ["utf-8" if v else "latin-1" for v in want_valid]


def test_html_extract_general_latin1_fallback():
    """Binary html in a legacy encoding goes through the charset
    fallback instead of failing the Arrow UTF-8 cast."""
    from flink_fingerprint_ray.functions.html import (
        extract_text_general, link_density)

    col = pa.array([
        '<p>café résumé</p><nav><a href="/">menü</a></nav>'.encode("latin-1"),
        "<p>utf8 naïve</p>".encode("utf-8"),
    ], pa.binary())
    assert extract_text_general(col).to_pylist() == [
        "café résumé\nmenü", "utf8 naïve"]
    ld = link_density(col).to_pylist()
    assert abs(ld[0] - 4 / 16) < 1e-12 and ld[1] == 0.0
