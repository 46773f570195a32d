"""robots.txt parsing + allow gate (operators/robots.py) vs an
independent python model: record grouping, exact-vs-star agent
precedence, comment/colon handling, longest-match with Allow tie-win,
wildcard flagging, and the allow-all defaults."""

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from pyspark_unload_to_gcs_spark.operators.robots import (  # noqa: E402
    robots_allowed,
    robots_rules,
    synth_robots,
)


def _directives(robots):
    out = []
    for pos, raw in enumerate((robots or "").split("\n")):
        body = re.sub(r"#.*", "", raw).strip()
        if ":" not in body:
            continue
        key = body.split(":", 1)[0].strip().lower()
        if key not in ("user-agent", "allow", "disallow"):
            continue
        value = re.sub(r"#.*", "", raw.split(":", 1)[1]).strip()
        out.append((pos, key, value))
    return out


def _rules_model(robots, agent):
    """Independent twin of robots_rules for one domain."""
    recs = []
    prev_ua = False
    for pos, key, value in _directives(robots):
        is_ua = key == "user-agent"
        if is_ua and not prev_ua:
            recs.append({"agents": [], "rules": []})
        if is_ua:
            recs[-1]["agents"].append(value)
        elif recs:
            recs[-1]["rules"].append((pos, key, value))
        prev_ua = is_ua
    exact = [
        r for r in recs
        if any(a.lower() == agent.lower() for a in r["agents"])
    ]
    star = [r for r in recs if "*" in r["agents"]]
    chosen = exact if exact else star
    return [
        (pos, key == "allow", value,
         "*" in value or value.endswith("$"))
        for r in chosen
        for (pos, key, value) in r["rules"]
    ]


def _allowed_model(rules, path):
    cands = [
        (allow, prefix)
        for (_, allow, prefix, wc) in rules
        if not wc and prefix != "" and path.startswith(prefix)
    ]
    if not cands:
        return True, None, None
    # max over (length, allow, prefix): longest wins, Allow wins the
    # length tie, bytewise-largest prefix reported on a residual tie
    allow, prefix = max(cands, key=lambda c: (len(c[1]), c[0], c[1]))
    return allow, prefix, allow


def _synth_model_text(i):
    if i % 3 == 0:
        return (
            "# synth robots\nUser-agent: TrainBot\nDisallow: /private/\n"
            "Allow: /private/ok/\nDisallow: /tmp/\n\nUser-agent: *\n"
            f"Disallow: /\n# trailing comment {i}"
        )
    if i % 3 == 1:
        return (
            "User-agent: *\nDisallow:\nDisallow: /search*q=\n"
            f"Allow: /public/ # inline comment\n# id {i}"
        )
    return f"# nothing but comments\nUser-agent: LoneBot\n# id {i}"


def test_synth_robots_matches_python_text(spark):
    df = spark.range(6).select(
        "id", synth_robots(F.col("id")).alias("r")
    )
    for row in df.collect():
        assert row["r"] == _synth_model_text(row["id"]), row["id"]


def test_robots_rules_match_model(spark):
    df = spark.range(9).select(
        F.concat(F.lit("d"), F.col("id").cast("string")).alias("domain"),
        synth_robots(F.col("id")).alias("robots_txt"),
    )
    for agent in ("trainbot", "TrainBot", "otherbot"):
        got = {
            (r["domain"], r["rule_order"], r["allow"],
             r["path_prefix"], r["has_wildcard"])
            for r in robots_rules(df, agent=agent).collect()
        }
        want = {
            (f"d{i}", pos, allow, prefix, wc)
            for i in range(9)
            for (pos, allow, prefix, wc) in _rules_model(
                _synth_model_text(i), agent
            )
        }
        assert got == want, agent


def test_robots_allowed_longest_match_and_defaults(spark):
    robots = spark.range(3).select(
        F.concat(F.lit("d"), F.col("id").cast("string")).alias("domain"),
        synth_robots(F.col("id")).alias("robots_txt"),
    )
    urls = spark.createDataFrame(
        [
            ("d0", "/private/ok/page"),   # Allow /private/ok/ (longest)
            ("d0", "/private/secret"),    # Disallow /private/
            ("d0", "/tmp/x"),             # Disallow /tmp/
            ("d0", "/open/page"),         # no rule -> allowed
            ("d1", "/search?q=leak"),     # wildcard rule skipped -> allowed
            ("d1", "/public/doc"),        # Allow /public/
            ("d2", "/anything"),          # LoneBot-only file -> allowed
            ("d9", "/no/robots/at/all"),  # absent domain -> allowed
        ],
        "domain string, path string",
    )
    rules = robots_rules(robots, agent="trainbot")
    got = {
        (r["domain"], r["path"]): (
            r["allowed"], r["matched_rule"], r["matched_allow"]
        )
        for r in robots_allowed(urls, rules).collect()
    }
    model_rules = {
        f"d{i}": _rules_model(_synth_model_text(i), "trainbot")
        for i in range(3)
    }
    for (dom, path), verdict in got.items():
        assert verdict == _allowed_model(
            model_rules.get(dom, []), path
        ), (dom, path)
    assert got[("d0", "/private/ok/page")][0] is True
    assert got[("d0", "/private/secret")][0] is False
    assert got[("d1", "/search?q=leak")] == (True, None, None)
    assert got[("d9", "/no/robots/at/all")] == (True, None, None)
    # star-agent fallback: everything on d0 denied for a foreign bot
    star_rules = robots_rules(robots, agent="otherbot")
    star = {
        (r["domain"], r["path"]): r["allowed"]
        for r in robots_allowed(urls, star_rules).collect()
    }
    assert star[("d0", "/open/page")] is False


def test_robots_null_and_headerless_bodies(spark):
    df = spark.createDataFrame(
        [
            ("a", None),
            ("b", "Disallow: /orphan/\nUser-agent: *\nDisallow: /x/"),
            ("c", "User-agent\nDisallow: /no-colon-header/"),
        ],
        "domain string, robots_txt string",
    )
    rules = robots_rules(df, agent="anybot")
    got = {
        (r["domain"], r["path_prefix"]) for r in rules.collect()
    }
    # orphan rule (before any User-agent:) drops; colon-less header is
    # not a record, so its rule is orphaned too
    assert got == {("b", "/x/")}


def test_robots_fuzz_matches_model(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    frag = st.sampled_from(
        [
            "User-agent: *", "User-agent: TrainBot", "user-agent: x",
            "User-agent", "Disallow: /a/", "Disallow: /a/b",
            "Allow: /a/b", "Disallow:", "Allow: /w*z", "# comment",
            "Disallow: /c/ # tail", "Sitemap: http://x/s.xml", "",
            "  Allow:   /pad/  ", "User-agent: *\r",
            "Disallow: /a/\r", "\tAllow:\t/pad/\t", "Disallow: /w$",
        ]
    )

    @settings(max_examples=8, deadline=None)
    @given(
        lines=st.lists(frag, min_size=0, max_size=12),
        agent=st.sampled_from(["trainbot", "*", "x"]),
        path=st.sampled_from(["/a/b/c", "/pad/x", "/w", "/"]),
    )
    def run(lines, agent, path):
        robots = "\n".join(lines)
        df = spark.createDataFrame(
            [("d", robots)], "domain string, robots_txt string"
        )
        rules = robots_rules(df, agent=agent)
        got = {
            (r["rule_order"], r["allow"], r["path_prefix"],
             r["has_wildcard"])
            for r in rules.collect()
        }
        want = set(_rules_model(robots, agent))
        assert got == want, (robots, agent)
        urls = spark.createDataFrame(
            [("d", path)], "domain string, path string"
        )
        verdict = robots_allowed(urls, rules).first()
        w_allow, w_rule, w_ma = _allowed_model(
            _rules_model(robots, agent), path
        )
        assert verdict["allowed"] == w_allow, (robots, agent, path)
        assert verdict["matched_rule"] == w_rule

    run()


def test_robots_plan_no_python(spark):
    df = spark.createDataFrame(
        [("d", "User-agent: *\nDisallow: /x/")],
        "domain string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [("d", "/x/y")], "domain string, path string"
    )
    out = robots_allowed(urls, robots_rules(df, agent="b"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_robots_crlf_and_tabs_do_not_fail_open(spark):
    """A CRLF-served robots.txt (the common real-server case) must
    parse identically to LF: F.trim strips only spaces, so the UA
    value would otherwise become '*\\r', match nothing, and the gate
    would silently allow every disallowed path (code-review
    regression). Tabs around keys/values likewise."""
    crlf = "User-agent: *\r\nDisallow: /private/\r\nAllow:\t/private/ok/\r\n"
    df = spark.createDataFrame(
        [("d", crlf)], "domain string, robots_txt string"
    )
    rules = robots_rules(df, agent="anybot")
    got = {
        (r["allow"], r["path_prefix"]) for r in rules.collect()
    }
    assert got == {(False, "/private/"), (True, "/private/ok/")}
    urls = spark.createDataFrame(
        [("d", "/private/x"), ("d", "/private/ok/y")],
        "domain string, path string",
    )
    verdicts = {
        r["path"]: r["allowed"]
        for r in robots_allowed(urls, rules).collect()
    }
    assert verdicts["/private/x"] is False
    assert verdicts["/private/ok/y"] is True


def test_robots_dollar_anchor_flagged(spark):
    """'$'-anchored rules belong to the wildcard extension: they must
    be flagged (and skipped by matching) instead of participating as
    literal prefixes (code-review regression)."""
    df = spark.createDataFrame(
        [("d", "User-agent: *\nDisallow: /download$\nDisallow: /dl/")],
        "domain string, robots_txt string",
    )
    rules = robots_rules(df, agent="b")
    flags = {r["path_prefix"]: r["has_wildcard"] for r in rules.collect()}
    assert flags == {"/download$": True, "/dl/": False}
    urls = spark.createDataFrame(
        [("d", "/download$trap"), ("d", "/download"), ("d", "/dl/x")],
        "domain string, path string",
    )
    verdicts = {
        r["path"]: r["allowed"]
        for r in robots_allowed(urls, rules).collect()
    }
    # the anchored rule neither wrongly denies the literal-prefix trap
    # nor silently denies /download; the plain rule still applies
    assert verdicts["/download$trap"] is True
    assert verdicts["/download"] is True
    assert verdicts["/dl/x"] is False


def test_robots_null_path_does_not_fail_open(spark):
    """A NULL path (url_parse failed) must not pass the compliance
    gate by default: startswith(NULL) drops every rule and the old
    coalesce reported allowed=TRUE for a URL that was never checked
    (ADVICE r13). Unparseable rows now get allowed=NULL, so a filter
    on allowed=TRUE visibly excludes them."""
    robots = spark.range(1).select(
        F.lit("d0").alias("domain"),
        synth_robots(F.col("id")).alias("robots_txt"),
    )
    urls = spark.createDataFrame(
        [("d0", None), ("d0", "/open/page"), ("dX", None)],
        "domain string, path string",
    )
    got = {
        (r["domain"], r["path"]): (
            r["allowed"], r["matched_rule"], r["matched_allow"]
        )
        for r in robots_allowed(urls, robots_rules(robots, agent="trainbot")).collect()
    }
    assert got[("d0", None)] == (None, None, None)
    assert got[("dX", None)] == (None, None, None)
    assert got[("d0", "/open/page")][0] is True
    kept = robots_allowed(urls, robots_rules(robots, agent="trainbot")).filter(
        F.col("allowed")
    )
    assert [r["path"] for r in kept.collect()] == ["/open/page"]
