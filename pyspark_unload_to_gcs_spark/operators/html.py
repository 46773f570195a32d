"""HTML boilerplate extraction — the first stage of every web-corpus
pipeline (C4/Gopher/RefinedWeb all start from markup, not text).

``html_text_extract`` turns a raw-HTML column into clean text plus the
link-density stats boilerplate classifiers key on (jusText/trafilatura
signal: navigation and footer blocks are link-dense, content is not):

- drop <script>/<style> blocks and <!-- comments --> (content-free);
- count anchors and their inner-text characters BEFORE stripping tags
  (the link-density numerator disappears with the markup otherwise);
- block-level tags (p/div/li/h1-6/tr/ul/ol/br, opening or closing)
  become newlines, every other tag is stripped;
- the five ubiquitous entities decode (&lt; &gt; &quot; &#39; &nbsp;
  first, &amp; LAST — decoding &amp; first would double-decode
  "&amp;lt;" into "<");
- whitespace normalizes per line (trim, collapse runs, drop empties).

Every step is a JVM-side regexp/string expression — one narrow map,
zero shuffles, whole-stage-codegen friendly; at 100 TB this runs at
parquet-scan speed next to the blob. No pattern uses backreferences or
lookaround, so the same regexes run identically on Java regex and RE2
(DuckDB), keeping the operator fully value-oracle-able.

NULL html stays NULL text with NULL stats (an absent page is not an
empty page — zero-filling would let a fetch-failure slice pass a
link-density gate).

``synth_html`` is the deterministic test/fixture wrapper (the WAV/BMP
synthesis precedent): it builds a closed-form page — head boilerplate,
a nav of doc_id-varied links, the document text in <p>, an
entity-laden footer — from (doc_id, text) with plain concat, so a
DuckDB oracle can rebuild the identical page and replay the extraction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tags whose opening OR closing boundary is a line break in rendered
# text; everything else strips silently
_BLOCK_TAGS = "br|p|div|li|h[1-6]|tr|ul|ol"
_ANCHOR_RE = r"(?is)<a\b[^>]*>(.*?)</a>"
_TAG_RE = r"(?s)<[^>]*>"

# decode order matters: &amp; strictly last (module docstring)
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def _decode_entities(col: Column) -> Column:
    for ent, ch in _ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def _strip_content_free(col: Column) -> Column:
    """Remove script/style blocks and comments. Two patterns, not one
    with a backreference (`</\\1>`) — RE2 has no backreferences and
    the oracle parity depends on staying in the common regex subset."""
    col = F.regexp_replace(col, r"(?is)<script\b[^>]*>.*?</script>", "")
    col = F.regexp_replace(col, r"(?is)<style\b[^>]*>.*?</style>", "")
    return F.regexp_replace(col, r"(?s)<!--.*?-->", "")


def _normalize_ws(col: Column) -> Column:
    lines = F.split(col, "\n")
    cleaned = F.transform(
        lines, lambda ln: F.trim(F.regexp_replace(ln, r"[ \t\r]+", " "))
    )
    return F.concat_ws("\n", F.filter(cleaned, lambda ln: ln != ""))


def html_text_extract(
    df: DataFrame,
    *,
    html_column: str = "html",
    text_column: str = "text",
) -> DataFrame:
    """Extract clean text + link-density stats (module docstring).

    Output columns: ``text_column`` (clean text), ``n_links`` (anchor
    count), ``anchor_chars`` (tag-stripped, entity-decoded, trimmed
    anchor inner-text characters), ``clean_chars`` (clean text
    characters), ``link_char_ppm`` (anchor_chars * 1e6 DIV
    max(clean_chars, 1) — exact integer floor, the boilerplate-gate
    number). All BIGINT; NULL html propagates NULLs."""
    raw = F.col(html_column)
    # the stripped body and the anchor array each feed SEVERAL gated
    # output columns — materialize them as their own projection stages
    # so the regex chains run once per row, not once per consumer
    # (CaseWhen branches block common-subexpression elimination; the
    # url_parse r14 finding)
    df = df.withColumn("__html_body", _strip_content_free(raw))
    body = F.col("__html_body")
    df = df.withColumn(
        "__html_anchors", F.regexp_extract_all(body, F.lit(_ANCHOR_RE), 1)
    )
    anchors = F.col("__html_anchors")
    anchor_chars = F.aggregate(
        F.transform(
            anchors,
            lambda a: F.length(
                F.trim(
                    _decode_entities(F.regexp_replace(a, _TAG_RE, ""))
                )
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    text = F.regexp_replace(
        body, rf"(?is)</?({_BLOCK_TAGS})\b[^>]*>", "\n"
    )
    text = _normalize_ws(_decode_entities(F.regexp_replace(text, _TAG_RE, "")))
    # every output gates on the INPUT's nullness: concat_ws/aggregate
    # swallow NULL into ''/0, which would let a fetch-failure slice
    # read as an empty-but-present page
    present = raw.isNotNull()

    def _gated(col):
        return F.when(present, col)

    out = df.withColumn("__t", _gated(text)).withColumn(
        "n_links", _gated(F.size(anchors).cast("long"))
    )
    return (
        out.withColumn("anchor_chars", _gated(anchor_chars))
        .withColumn("clean_chars", F.length(F.col("__t")).cast("long"))
        .withColumn(
            "link_char_ppm",
            F.expr(
                "CAST((CAST(anchor_chars AS DECIMAL(38,0)) * 1000000) "
                "DIV GREATEST(clean_chars, 1) AS BIGINT)"
            ),
        )
        .withColumn(text_column, F.col("__t"))
        .drop("__t", "__html_body", "__html_anchors")
    )


def synth_html(id_col: Column, text_col: Column) -> Column:
    """Deterministic closed-form HTML page for tests/oracles: nav links
    vary with ``id_col % 3`` (so link density varies per doc), the
    document text lands in one <p>, the footer exercises entities and
    an attribute-bearing anchor. Plain concat — a SQL oracle rebuilds
    the identical string."""
    sid = id_col.cast("string")
    extra = F.when(
        id_col % 3 == 0,
        F.concat(F.lit('<li><a href="/x">Extra '), sid, F.lit("</a></li>")),
    ).otherwise(F.lit(""))
    return F.concat(
        F.lit("<html><head><title>Doc "),
        sid,
        F.lit("</title><style>body { color: red; }</style>"),
        F.lit('<script type="text/javascript">var x = 1 < 2; // '),
        sid,
        F.lit("</script></head><body>"),
        F.lit("<!-- nav boilerplate -->"),
        F.lit('<div class="nav"><ul><li><a href="/">Home</a></li>'),
        F.lit('<li><a href="/a">About &amp; Contact</a></li>'),
        extra,
        F.lit("</ul></div><h1>Doc "),
        sid,
        F.lit("</h1><p>"),
        text_col,
        F.lit('</p><div class="footer"><a href="/t">Terms &quot;of&quot; use&nbsp;'),
        sid,
        F.lit("</a></div></body></html>"),
    )
