"""HTML boilerplate extraction (operators/html.py) vs an independent
python re-implementation, plus the crafted edge cases the regexes must
hold on (entity decode order, content-free blocks, NULL propagation,
link density arithmetic)."""

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

_BLOCK = r"(?is)</?(br|p|div|li|h[1-6]|tr|ul|ol)\b[^>]*>"
_ENTS = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def _model(html: str) -> dict:
    """Independent python twin of html_text_extract (re module)."""
    body = re.sub(r"(?is)<script\b[^>]*>.*?</script>", "", html)
    body = re.sub(r"(?is)<style\b[^>]*>.*?</style>", "", body)
    body = re.sub(r"(?s)<!--.*?-->", "", body)
    anchors = re.findall(r"(?is)<a\b[^>]*>(.*?)</a>", body)

    def dec(s: str) -> str:
        for e, c in _ENTS:
            s = s.replace(e, c)
        return s

    # strip(" ") not strip(): the operator's F.trim (and DuckDB's trim,
    # the oracle engine) removes only the SPACE character, so an anchor
    # whose inner text is "\n" or "\t" keeps that character in
    # anchor_chars. Python str.strip() removes all whitespace and
    # diverged from both engines on such anchors (fuzz finding, r16:
    # <a href='/x'>\n</a> counted 1 by the engines, 0 by the model).
    anchor_chars = sum(
        len(dec(re.sub(r"(?s)<[^>]*>", "", a)).strip(" ")) for a in anchors
    )
    text = re.sub(_BLOCK, "\n", body)
    text = dec(re.sub(r"(?s)<[^>]*>", "", text))
    lines = [re.sub(r"[ \t\r]+", " ", ln).strip() for ln in text.split("\n")]
    text = "\n".join(ln for ln in lines if ln)
    clean = len(text)
    return {
        "text": text,
        "n_links": len(anchors),
        "anchor_chars": anchor_chars,
        "clean_chars": clean,
        "link_char_ppm": (anchor_chars * 1_000_000) // max(clean, 1),
    }


_CASES = [
    # nav + content + footer: the canonical boilerplate shape
    '<html><body><div class="nav"><a href="/">Home</a> <a href="/a">About'
    "</a></div><p>real content words here</p>"
    '<div class="footer"><a href="/t">Terms</a></div></body></html>',
    # script with a '<' inside, style, comments — all content-free
    '<script>if (1 < 2) { alert("x <b>not bold</b>"); }</script>'
    "<style>p { color: red; } /* <p> */</style>"
    "<!-- <a href='/x'>ghost link</a> -->"
    "<p>survivor</p>",
    # entity decode order: &amp;lt; must become the literal "&lt;"
    "<p>a &amp;lt; b &lt; c &quot;q&quot; &#39;s&#39;&nbsp;end&amp;</p>",
    # anchors with nested markup and attributes
    '<a class="x" href="/1"><b>Bold</b> link</a><a href="/2"></a>'
    "<p>body text</p>",
    # block tags vs inline tags: h2/li/br break lines, b/span do not
    "<h2>Title</h2><ul><li>one</li><li>two</li></ul>"
    "first<br/>second <b>bo</b><span>ld</span>",
    # whitespace collapse: tabs, CR, runs, blank lines
    "<p>  a\t\tb  </p>\n\n<p> c\r\nd </p>",
    # pathological: unclosed tag eats to next '>', text with no markup
    "<p>before <unclosed attr text after</p>",
    "no markup at all",
    "",
    # fuzz regression (r16): newline-only / tab-only anchor inner text —
    # space-only trim keeps the character (engines agree; a python
    # .strip() model would read 0)
    "<a href='/x'>\n</a>",
    "<a href='/x'>\t</a><p>body</p>",
]


def test_html_extract_matches_python_model(spark):
    from pyspark_unload_to_gcs_spark.operators.html import html_text_extract

    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(_CASES)], "id long, html string"
    )
    got = {
        r["id"]: r.asDict()
        for r in html_text_extract(df).select(
            "id", "text", "n_links", "anchor_chars", "clean_chars",
            "link_char_ppm",
        ).collect()
    }
    for i, h in enumerate(_CASES):
        want = _model(h)
        for k, v in want.items():
            assert got[i][k] == v, (i, k, got[i][k], v)


def test_html_extract_null_propagates(spark):
    """NULL html is an absent page, not an empty one — every output
    stays NULL so a fetch-failure slice can't pass a link-density
    gate as 'zero links'."""
    from pyspark_unload_to_gcs_spark.operators.html import html_text_extract

    df = spark.createDataFrame(
        [(1, None), (2, "<p>x y z</p>")], "id long, html string"
    )
    rows = {r["id"]: r for r in html_text_extract(df).collect()}
    assert rows[1]["text"] is None
    assert rows[1]["n_links"] is None
    assert rows[1]["anchor_chars"] is None
    assert rows[1]["clean_chars"] is None
    assert rows[1]["link_char_ppm"] is None
    assert rows[2]["text"] == "x y z"
    assert rows[2]["n_links"] == 0
    assert rows[2]["link_char_ppm"] == 0


def test_synth_html_roundtrip_and_link_density(spark):
    """The deterministic fixture wrapper: extraction recovers the doc
    text plus the known boilerplate lines, nav links vary with
    doc_id % 3, and the entity-laden footer decodes."""
    from pyspark_unload_to_gcs_spark.operators.html import (
        html_text_extract,
        synth_html,
    )

    docs = spark.createDataFrame(
        [(3, "alpha beta gamma"), (4, "delta epsilon")],
        "doc_id long, text string",
    )
    pages = docs.select(
        "doc_id", synth_html(F.col("doc_id"), F.col("text")).alias("html")
    )
    rows = {r["doc_id"]: r for r in html_text_extract(pages).collect()}

    t3 = rows[3]["text"].split("\n")
    assert "alpha beta gamma" in t3
    assert "Doc 3" in t3  # the h1 survives as its own line
    assert "Home" in t3
    assert "About & Contact" in t3  # &amp; decoded
    assert "Extra 3" in t3  # doc_id % 3 == 0 gets the extra link
    assert 'Terms "of" use 3' in t3  # &quot; and &nbsp; decoded
    assert rows[3]["n_links"] == 4
    assert rows[4]["n_links"] == 3  # no extra link
    assert "Extra" not in rows[4]["text"]
    # boilerplate-heavy synthetic pages: link density is material
    assert rows[3]["link_char_ppm"] > 100_000
    # the longer doc text dilutes link density
    assert rows[3]["link_char_ppm"] != rows[4]["link_char_ppm"]
    # python-model agreement on the full synthesized page
    html3 = pages.filter(F.col("doc_id") == 3).first()["html"]
    want = _model(html3)
    assert rows[3]["text"] == want["text"]
    assert rows[3]["anchor_chars"] == want["anchor_chars"]
    assert rows[3]["link_char_ppm"] == want["link_char_ppm"]


def test_html_extract_plan_is_narrow(spark):
    """The whole extraction must stay a narrow map — zero exchanges,
    no Python stages; at 100 TB this runs at scan speed."""
    from pyspark_unload_to_gcs_spark.operators.html import html_text_extract

    df = spark.createDataFrame([(1, "<p>x</p>")], "id long, html string")
    plan = (
        html_text_extract(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_html_extract_fuzz_matches_model(spark):
    """Hypothesis fuzz over markup-adjacent character soup ('<', '>',
    '&', quotes, whitespace, entity fragments): the Spark regexes and
    the python re model must agree on text that is NOT well-formed
    HTML — the crawl reality."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pyspark_unload_to_gcs_spark.operators.html import html_text_extract

    frag = st.sampled_from(
        [
            "<p>", "</p>", "<a href='/x'>", "</a>", "<b>", "</b>",
            "<script>", "</script>", "<!--", "-->", "&amp;", "&lt;",
            "&nbsp;", "word", "two words", "<", ">", "&", '"', "\n",
            "\t", " ", "<br/>", "<div >", "</div>", "<unclosed",
        ]
    )

    @settings(max_examples=8, deadline=None)
    @given(parts=st.lists(frag, min_size=0, max_size=30))
    def run(parts):
        html = "".join(parts)
        df = spark.createDataFrame([(0, html)], "id long, html string")
        got = html_text_extract(df).select(
            "text", "n_links", "anchor_chars", "clean_chars",
            "link_char_ppm",
        ).first()
        want = _model(html)
        assert got["text"] == want["text"], html
        assert got["n_links"] == want["n_links"], html
        assert got["anchor_chars"] == want["anchor_chars"], html
        assert got["clean_chars"] == want["clean_chars"], html
        assert got["link_char_ppm"] == want["link_char_ppm"], html

    run()
