"""URL canonicalization — the identity key of every web-corpus
pipeline (crawl dedup, per-site quotas, robots/blocklist joins all key
on a canonical URL or its registrable domain, never the raw string).

``url_parse`` splits an absolute URL into (scheme, host, port, path,
query, fragment) with one RFC-3986-shaped regex. ``url_normalize``
builds the canonical form the dedup/join layers key on:

- scheme and host lowercase; a trailing host dot drops
  (``example.com.`` is the same FQDN as ``example.com``);
- userinfo (``user:pw@``) drops — it is never part of page identity;
- default ports drop (``http:80``, ``https:443``); other ports stay;
- an empty path becomes ``/`` (``http://a.com`` == ``http://a.com/``);
- the query splits on ``&``; empty params, params whose NAME is in
  ``strip_params`` (fbclid/gclid/... click IDs), and params whose name
  starts with a ``strip_prefixes`` entry (``utm_*``) drop; survivors
  sort bytewise and rejoin — param order never distinguishes pages;
- the fragment drops (client-side only).

Deliberately out of scope (documented, not silently wrong):
percent-encoding case/decode normalization, path dot-segment
resolution, IDNA, and the full public-suffix list. ``registrable_
domain`` uses a PSL-lite heuristic: a built-in set of the ~40 most
common multi-label suffixes (co.uk, com.au, co.jp, ...) promotes the
cut from 2 to 3 labels; everything else takes the last two labels.

Every step is a JVM-side regexp/string/array expression — one narrow
map, zero shuffles, whole-stage-codegen friendly; at 100 TB this runs
at parquet-scan speed next to the crawl blob. No pattern uses
backreferences or lookaround, so the same regexes run identically on
Java regex and RE2/DuckDB, keeping the operator fully
value-oracle-able (string_split/list_filter/list_sort on the oracle
side mirror split/filter/array_sort here).

NULL url stays NULL everywhere; a URL the anchored grammar rejects —
no ``scheme://``, or an embedded line terminator the fragment/query
classes refuse to cross — also yields NULL parts and NULL canonical
form. A relative href is not an identity, and letting a rejected URL
degrade to empty parts would give every malformed input the same
shared canonical key.

``synth_url`` is the deterministic fixture wrapper (the synth_html /
WAV/BMP precedent): it builds a closed-form messy URL — upper/lower
scheme and host case varying with ``id % 4``, a default or explicit
port with ``id % 3``, tracking params and an out-of-order keeper param
with ``id % 2``, a fragment — from an id column with plain concat, so
a SQL oracle rebuilds the identical string and replays the
normalization end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one RFC-3986-shaped pass: scheme :// authority path ?query #fragment
# (no backreferences/lookaround — Java regex and RE2 agree)
_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"

# click-identifier params every major pipeline strips (name equality)
DEFAULT_STRIP_PARAMS: tuple[str, ...] = (
    "fbclid",
    "gclid",
    "gclsrc",
    "dclid",
    "msclkid",
    "mc_cid",
    "mc_eid",
    "igshid",
    "yclid",
    "wbraid",
    "gbraid",
    "_ga",
    "_gl",
)

# name-prefix strips (utm_source/utm_medium/... and friends)
DEFAULT_STRIP_PREFIXES: tuple[str, ...] = ("utm_",)

# PSL-lite: common multi-label public suffixes that promote the
# registrable cut from the last 2 labels to the last 3
MULTILABEL_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "net.nz", "org.nz",
    "co.in", "net.in", "org.in", "ac.in",
    "co.kr", "or.kr", "co.za",
    "com.br", "net.br", "org.br",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
    "com.my", "com.pl",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
)


def _part(url: Column, group: int) -> Column:
    return F.regexp_extract(url, _URL_RE, group)


# group separator for the packed single-pass extraction below; \x01
# never appears in sane URLs, and rows that DO contain it take the
# per-group extraction fallback, so the packing is a pure optimization
_SEP = "\x01"


def url_parse(df: DataFrame, *, url_column: str = "url") -> DataFrame:
    """Add (scheme, host, port, path, query, fragment) string columns.

    scheme/host come back lowercased (case is never significant there);
    path/query/fragment keep their bytes. query/fragment carry no
    leading ``?``/``#``. userinfo is dropped; a bracketed IPv6
    authority keeps the brackets as the host and splits its port only
    after the closing bracket. NULL or non-absolute input yields NULL
    for every part (module docstring).

    Extraction is ONE anchored-regex pass per row, not one per part
    (r14: six regexp_extract calls over the full URL — each duplicated
    into every ``when(present, ...)`` branch, where CaseWhen blocks
    common-subexpression elimination — made this the slowest
    expression in the url family): ``regexp_replace`` rewrites the
    matched URL to its five groups joined on ``\\x01`` (Java
    substitutes the empty string for an unmatched optional group), one
    ``split`` fans them out, and the pack is materialized as its OWN
    projection stage — CollapseProject keeps a non-cheap expression
    referenced more than once in a separate project, so the regex runs
    once per row no matter how many part columns read it. A URL that
    itself contains the separator byte — no real URL does — falls
    back per row to the per-group extraction, so the result is
    byte-identical either way (pinned by the url fuzz tests)."""
    url = F.col(url_column)
    # presence must gate on the SAME fully-anchored pattern the parts
    # extract with: gating on the _ABS_RE prefix alone lets a URL that
    # matches the prefix but fails the full match (e.g. a newline in
    # the fragment — '.' does not cross line terminators) yield
    # empty-string parts, and url_normalize would then collapse every
    # such URL onto one shared ':///' canonical key
    present = url.rlike(_URL_RE)

    packed = F.split(
        F.regexp_replace(
            url, _URL_RE, _SEP.join(f"${g}" for g in range(1, 6))
        ),
        _SEP,
        -1,
    )
    fast = ~url.contains(_SEP)
    staged = df.withColumns({"__url_parts": packed, "__url_present": present})
    parts = F.col("__url_parts")

    def _grp(g: int) -> Column:
        # split is 0-based; regex groups are 1-based; the fallback
        # regex only evaluates on separator-bearing rows
        return F.when(fast, F.get(parts, g - 1)).otherwise(_part(url, g))

    def _gated(col: Column) -> Column:
        return F.when(F.col("__url_present"), col)

    # auth feeds host AND port (and the bracket probe) — its own stage,
    # for the same CollapseProject reason as the pack
    staged = staged.withColumn(
        "__url_auth", F.regexp_replace(_grp(2), r"^.*@", "")
    )
    auth = F.col("__url_auth")
    # [v6]:port — port is what follows the bracket's ':', else the
    # usual host:port split on the first ':'
    bracketed = auth.startswith("[")
    host = F.when(
        bracketed, F.regexp_extract(auth, r"^(\[[^\]]*\])", 1)
    ).otherwise(F.split_part(auth, F.lit(":"), F.lit(1)))
    port = F.when(
        bracketed, F.regexp_extract(auth, r"^\[[^\]]*\]:([0-9]+)$", 1)
    ).otherwise(
        F.when(
            auth.contains(":"), F.split_part(auth, F.lit(":"), F.lit(2))
        ).otherwise(F.lit(""))
    )
    return (
        staged.withColumn("scheme", _gated(F.lower(_grp(1))))
        .withColumn(
            "host",
            _gated(F.regexp_replace(F.lower(host), r"[.]+$", "")),
        )
        .withColumn("port", _gated(port))
        .withColumn("path", _gated(_grp(3)))
        .withColumn(
            "query", _gated(F.regexp_replace(_grp(4), r"^\?", ""))
        )
        .withColumn(
            "fragment",
            _gated(F.regexp_replace(_grp(5), r"^#", "")),
        )
        .drop("__url_parts", "__url_present", "__url_auth")
    )


def registrable_domain(host: Column) -> Column:
    """PSL-lite registrable domain of an already-lowercased host
    (module docstring): last 3 labels when the last 2 form a known
    multi-label public suffix, else last 2, else the host itself.
    A host with no dot (``localhost``) or an IP-ish/bracketed host
    passes through unchanged."""
    # F.get is 0-based and NULL-safe out of range (element_at raises
    # under ANSI, and the multi-label predicate evaluates on EVERY
    # row, including dotless hosts where n-2 is negative)
    labels = F.split(host, r"[.]")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.get(labels, n - 2), F.get(labels, n - 1)
    )
    last3 = F.concat_ws(
        ".",
        F.get(labels, n - 3),
        F.get(labels, n - 2),
        F.get(labels, n - 1),
    )
    is_multi = last2.isin(*MULTILABEL_SUFFIXES)
    return F.when(host.rlike(r"^\[") | host.rlike(r"^[0-9.]+$"), host).otherwise(
        F.when((n >= 3) & is_multi, last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def url_normalize(
    df: DataFrame,
    *,
    url_column: str = "url",
    out_column: str = "url_norm",
    strip_params: tuple[str, ...] = DEFAULT_STRIP_PARAMS,
    strip_prefixes: tuple[str, ...] = DEFAULT_STRIP_PREFIXES,
) -> DataFrame:
    """Add the canonical URL plus join keys (module docstring).

    Output columns: ``out_column`` (canonical form), ``host``,
    ``domain`` (registrable), ``n_params_kept``, ``n_params_stripped``
    (both BIGINT). NULL / non-absolute input propagates NULL for all
    five."""
    parsed = url_parse(df, url_column=url_column)
    scheme = F.col("scheme")
    host = F.col("host")
    port = F.col("port")

    def _dropped(p: Column) -> Column:
        name = F.split_part(p, F.lit("="), F.lit(1))
        hit = name.isin(*strip_params)
        for pre in strip_prefixes:
            hit = hit | name.startswith(pre)
        return hit

    # the param arrays feed two consumers each (counts + the canonical
    # concat) — materialize them as their own projection stages so the
    # interpreted higher-order filters run once per row instead of once
    # per consumer (the url_parse CollapseProject rationale, r14)
    parsed = parsed.withColumn(
        "__raw_params",
        F.filter(F.split(F.col("query"), "&"), lambda p: p != ""),
    ).withColumn(
        "__kept_params",
        F.array_sort(
            F.filter(F.col("__raw_params"), lambda p: ~_dropped(p))
        ),
    )
    raw_params = F.col("__raw_params")
    kept = F.col("__kept_params")
    n_raw = F.size(raw_params).cast("long")
    n_kept = F.size(kept).cast("long")

    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    port_part = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path_part = F.when(F.col("path") == "", F.lit("/")).otherwise(
        F.col("path")
    )
    query_part = F.when(n_kept == 0, F.lit("")).otherwise(
        F.concat(F.lit("?"), F.concat_ws("&", kept))
    )
    norm = F.concat(
        scheme, F.lit("://"), host, port_part, path_part, query_part
    )
    present = F.col("scheme").isNotNull()

    def _gated(col: Column) -> Column:
        return F.when(present, col)

    return (
        parsed.withColumn(out_column, _gated(norm))
        .withColumn("domain", _gated(registrable_domain(host)))
        .withColumn("n_params_kept", _gated(n_kept))
        .withColumn("n_params_stripped", _gated(n_raw - n_kept))
        .drop(
            "scheme", "port", "path", "query", "fragment",
            "__raw_params", "__kept_params",
        )
    )


def synth_url(id_col: Column) -> Column:
    """Deterministic closed-form messy URL for tests/oracles: scheme
    and host case vary with ``id % 4``, port presence/value with
    ``id % 3``, tracking params and an out-of-order keeper with
    ``id % 2``, plus a constant fragment. Plain concat — a SQL oracle
    rebuilds the identical string (module docstring)."""
    sid = id_col.cast("string")
    scheme = (
        F.when(id_col % 4 == 0, "HTTP://")
        .when(id_col % 4 == 1, "https://")
        .when(id_col % 4 == 2, "Https://")
        .otherwise("http://")
    )
    host = (
        F.when(
            id_col % 4 == 0,
            F.concat(F.lit("WWW.Site"), (id_col % 7).cast("string"), F.lit(".Example.COM")),
        )
        .when(
            id_col % 4 == 1,
            F.concat(F.lit("shop"), (id_col % 7).cast("string"), F.lit(".example.co.uk")),
        )
        .otherwise(
            F.concat(F.lit("site"), (id_col % 7).cast("string"), F.lit(".example.com."))
        )
    )
    port = (
        F.when(id_col % 3 == 0, ":80")
        .when(id_col % 3 == 1, ":8080")
        .otherwise("")
    )
    query = F.when(
        id_col % 2 == 0,
        F.concat(
            F.lit("?z=last&utm_source=feed&a="),
            sid,
            F.lit("&fbclid=XYZ&m=mid"),
        ),
    ).otherwise(F.concat(F.lit("?b="), sid))
    return F.concat(
        scheme,
        F.lit("user:pw@"),
        host,
        port,
        F.lit("/Path/To/page"),
        sid,
        query,
        F.lit("#frag"),
    )
