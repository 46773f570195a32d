"""URL canonicalization (operators/url.py) vs an independent python
re/string re-implementation, plus the crafted edge cases the regexes
must hold on (userinfo, default ports, bracketed IPv6, tracking-param
strips, PSL-lite domains, NULL / non-absolute propagation)."""

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from pyspark_unload_to_gcs_spark.operators.url import (  # noqa: E402
    DEFAULT_STRIP_PARAMS,
    DEFAULT_STRIP_PREFIXES,
    MULTILABEL_SUFFIXES,
    synth_url,
    url_normalize,
    url_parse,
)

_URL_RE = re.compile(
    r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"
)


def _parse_model(url):
    """Independent python twin of url_parse."""
    none = dict.fromkeys(
        ["scheme", "host", "port", "path", "query", "fragment"]
    )
    if url is None:
        return none
    m = _URL_RE.match(url)
    if not m:
        return none
    auth = re.sub(r"^.*@", "", m.group(2))
    if auth.startswith("["):
        bm = re.match(r"^(\[[^\]]*\])", auth)
        host = bm.group(1) if bm else ""
        pm = re.match(r"^\[[^\]]*\]:([0-9]+)$", auth)
        port = pm.group(1) if pm else ""
    else:
        parts = auth.split(":")
        host, port = parts[0], (parts[1] if len(parts) > 1 else "")
    return {
        "scheme": m.group(1).lower(),
        "host": re.sub(r"[.]+$", "", host.lower()),
        "port": port,
        "path": m.group(3),
        "query": (m.group(4) or "")[1:],
        "fragment": (m.group(5) or "")[1:],
    }


def _domain_model(host):
    if host.startswith("[") or re.fullmatch(r"[0-9.]+", host):
        return host
    labels = host.split(".")
    if len(labels) >= 3 and ".".join(labels[-2:]) in MULTILABEL_SUFFIXES:
        return ".".join(labels[-3:])
    if len(labels) >= 2:
        return ".".join(labels[-2:])
    return host


def _norm_model(url):
    """Independent python twin of url_normalize."""
    p = _parse_model(url)
    if p["scheme"] is None:
        return dict.fromkeys(
            ["url_norm", "host", "domain", "n_params_kept",
             "n_params_stripped"]
        )
    raw = [q for q in p["query"].split("&") if q != ""]

    def dropped(q):
        name = q.split("=")[0]
        return name in DEFAULT_STRIP_PARAMS or any(
            name.startswith(pre) for pre in DEFAULT_STRIP_PREFIXES
        )

    kept = sorted(q for q in raw if not dropped(q))
    default = (p["scheme"] == "http" and p["port"] == "80") or (
        p["scheme"] == "https" and p["port"] == "443"
    )
    port_part = "" if (p["port"] == "" or default) else ":" + p["port"]
    path_part = p["path"] if p["path"] else "/"
    query_part = "?" + "&".join(kept) if kept else ""
    return {
        "url_norm": p["scheme"] + "://" + p["host"] + port_part
        + path_part + query_part,
        "host": p["host"],
        "domain": _domain_model(p["host"]),
        "n_params_kept": len(kept),
        "n_params_stripped": len(raw) - len(kept),
    }


_CASES = [
    # case, userinfo, trailing host dot, default port, utm strip, frag
    "HTTP://User:pw@WWW.Example.COM.:80/A/b?utm_source=x&z=1&a=2#frag",
    # https default port, multi-label suffix, empty path
    "https://Shop.Example.CO.UK:443",
    # explicit non-default port survives
    "https://example.co.uk:8443/x",
    # empty query / lone '?', empty params
    "http://example.com/p?",
    "http://example.com/p?&&",
    # click-id strips, param without '=', name 'utm' (no underscore)
    "http://a.example.com/p?fbclid=abc&flag&utm=keep&gclid=1",
    # duplicate params sort bytewise
    "http://example.com/p?a=1&a=0&B=2",
    # non-http scheme: port never default-stripped
    "ftp://h.example.org:21/x",
    # bracketed IPv6 with and without port
    "http://[2001:db8::1]:8080/x",
    "http://[2001:db8::1]/x",
    # IPv4 host passes through registrable-domain untouched
    "http://10.1.2.3:8080/x?b=1",
    # dotless host
    "http://localhost/x",
    # no authority at all (file scheme): empty host
    "file:///etc/hosts",
    # relative / garbage inputs -> NULLs
    "relative/path?x=1",
    "not a url",
    "",
]


def test_url_parse_matches_python_model(spark):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(_CASES)], "id long, url string"
    )
    got = {r["id"]: r.asDict() for r in url_parse(df).collect()}
    for i, u in enumerate(_CASES):
        want = _parse_model(u)
        for k, v in want.items():
            assert got[i][k] == v, (u, k, got[i][k], v)


def test_url_normalize_matches_python_model(spark):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(_CASES)], "id long, url string"
    )
    got = {r["id"]: r.asDict() for r in url_normalize(df).collect()}
    for i, u in enumerate(_CASES):
        want = _norm_model(u)
        for k, v in want.items():
            assert got[i][k] == v, (u, k, got[i][k], v)


def test_url_normalize_idempotent_and_identifying(spark):
    """Canonicalization is a fixpoint (normalizing the normal form is
    a no-op) and collapses the equivalence class: the messy case
    variants of one page all land on one canonical key."""
    variants = [
        "http://www.example.com/p?b=2&a=1",
        "HTTP://WWW.EXAMPLE.COM:80/p?a=1&b=2#top",
        "http://u@www.example.com./p?utm_medium=m&b=2&fbclid=z&a=1",
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(variants)], "id long, url string"
    )
    norms = [r["url_norm"] for r in url_normalize(df).collect()]
    assert len(set(norms)) == 1
    assert norms[0] == "http://www.example.com/p?a=1&b=2"
    again = url_normalize(
        spark.createDataFrame([(0, norms[0])], "id long, url string")
    ).first()
    assert again["url_norm"] == norms[0]


def test_url_null_and_nonabsolute_propagate(spark):
    """NULL url is an absent record and a relative href is not an
    identity — both yield NULL parts and NULL canonical form rather
    than a shareable empty key."""
    df = spark.createDataFrame(
        [(1, None), (2, "/relative"), (3, "http://e.com/x")],
        "id long, url string",
    )
    rows = {r["id"]: r for r in url_normalize(df).collect()}
    for rid in (1, 2):
        assert rows[rid]["url_norm"] is None
        assert rows[rid]["host"] is None
        assert rows[rid]["domain"] is None
        assert rows[rid]["n_params_kept"] is None
        assert rows[rid]["n_params_stripped"] is None
    assert rows[3]["url_norm"] == "http://e.com/x"
    assert rows[3]["domain"] == "e.com"
    assert rows[3]["n_params_kept"] == 0


def test_registrable_domain_psl_lite(spark):
    from pyspark_unload_to_gcs_spark.operators.url import (
        registrable_domain,
    )

    cases = {
        "a.b.shop.example.co.uk": "example.co.uk",
        "example.co.uk": "example.co.uk",
        "co.uk": "co.uk",  # 2 labels: no 3rd to promote to
        "deep.sub.example.com": "example.com",
        "example.com": "example.com",
        "localhost": "localhost",
        "10.1.2.3": "10.1.2.3",
        "[2001:db8::1]": "[2001:db8::1]",
        "www.example.com.au": "example.com.au",
    }
    df = spark.createDataFrame(
        [(h,) for h in cases], "host string"
    ).withColumn("d", registrable_domain(F.col("host")))
    for r in df.collect():
        assert r["d"] == cases[r["host"]], r


def test_url_normalize_plan_is_narrow(spark):
    """The whole canonicalization must stay a narrow map — zero
    exchanges, no Python stages; at 100 TB this runs at scan speed."""
    df = spark.createDataFrame(
        [(1, "http://e.com/x?a=1")], "id long, url string"
    )
    plan = (
        url_normalize(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_synth_url_roundtrip(spark):
    """The deterministic fixture wrapper: every id%4 / id%3 / id%2 arm
    normalizes to the expected canonical form, and the Spark result
    agrees with the python model on the full synthesized string."""
    n = 24
    df = spark.range(n).select(
        F.col("id"), synth_url(F.col("id")).alias("url")
    )
    rows = {r["id"]: r for r in url_normalize(df).collect()}
    urls = {r["id"]: r["url"] for r in df.collect()}
    for i in range(n):
        want = _norm_model(urls[i])
        got = rows[i]
        for k, v in want.items():
            assert got[k] == v, (i, urls[i], k, got[k], v)
    # arm spot-checks: id=0 -> HTTP://user:pw@WWW.Site0.Example.COM:80
    assert rows[0]["url_norm"] == (
        "http://www.site0.example.com/Path/To/page0?a=0&m=mid&z=last"
    )
    assert rows[0]["n_params_stripped"] == 2
    # id=1 -> https co.uk host, :8080 kept
    assert rows[1]["url_norm"] == (
        "https://shop1.example.co.uk:8080/Path/To/page1?b=1"
    )
    assert rows[1]["domain"] == "example.co.uk"
    # id=3 -> trailing-dot host arm
    assert rows[3]["host"] == "site3.example.com"


def test_url_fuzz_matches_model(spark):
    """Hypothesis fuzz over URL-adjacent character soup (schemes,
    separators, userinfo '@', brackets, params with and without '=',
    strippable names): Spark and the python model must agree on
    strings that are NOT well-formed URLs — the crawl reality."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    frag = st.sampled_from(
        [
            "http://", "HTTPS://", "://", "//", "example", ".com",
            ".co.uk", ".", "..", ":80", ":443", ":8080", ":x", "@",
            "user@", "/", "/path", "?", "?a=1", "&", "a=1", "b=",
            "=c", "utm_x=1", "fbclid=2", "#", "#f", "[", "]",
            "[::1]", "%20", " ", "Path",
            # the packed single-pass extraction's group separator —
            # URLs containing it must take the per-group fallback and
            # still match the model byte for byte (r14)
            "\x01",
        ]
    )

    @settings(max_examples=8, deadline=None)
    @given(parts=st.lists(frag, min_size=0, max_size=12))
    def run(parts):
        url = "".join(parts)
        df = spark.createDataFrame([(0, url)], "id long, url string")
        got = url_normalize(df).first().asDict()
        want = _norm_model(url)
        for k, v in want.items():
            assert got[k] == v, (url, k, got[k], v)

    run()


def test_url_rejected_by_anchored_grammar_is_null(spark):
    """A URL whose prefix looks absolute but whose body fails the
    anchored grammar (embedded line terminator) must be NULL — not
    empty parts that would collapse every malformed URL onto one
    shared ':///' canonical key (code-review regression)."""
    rows = [
        (1, "http://site-a.com/page#x\ny"),
        (2, "http://site-b.org/other#p\nq"),
        (3, "http://ok.example.com/fine"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    got = {r["id"]: r for r in url_normalize(df).collect()}
    for rid in (1, 2):
        assert got[rid]["url_norm"] is None, rid
        assert got[rid]["host"] is None
        assert got[rid]["domain"] is None
    assert got[3]["url_norm"] == "http://ok.example.com/fine"
    # and the python model agrees on all three
    for rid, url in rows:
        want = _norm_model(url)
        for k, v in want.items():
            assert got[rid][k] == v, (url, k)


def test_url_parse_separator_byte_takes_fallback(spark):
    """A URL containing the \\x01 packing separator must parse via the
    per-group fallback with results identical to separator-free parts
    (r14 single-pass extraction): the separator riding in the path
    must come back verbatim, not shift the group split."""
    weird = "http://Ex.COM:8080/pa\x01th?a=1&utm_x=2#f"
    plain = "http://Ex.COM:8080/path?a=1&utm_x=2#f"
    rows = {
        r["id"]: r
        for r in url_parse(
            spark.createDataFrame(
                [(1, weird), (2, plain)], "id long, url string"
            )
        ).collect()
    }
    assert rows[1]["scheme"] == rows[2]["scheme"] == "http"
    assert rows[1]["host"] == rows[2]["host"] == "ex.com"
    assert rows[1]["port"] == "8080"
    assert rows[1]["path"] == "/pa\x01th"
    assert rows[1]["query"] == rows[2]["query"] == "a=1&utm_x=2"
    assert rows[1]["fragment"] == "f"
