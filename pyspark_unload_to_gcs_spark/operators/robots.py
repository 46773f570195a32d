"""robots.txt compliance — the gate between a crawl frontier and a
fetch (RFC 9309, simplified): parse per-domain robots.txt bodies into
a rules table, then decide allow/deny per (domain, path) with the
longest-match rule.

``robots_rules`` is a distributed line parser. robots.txt grouping is
ORDER-dependent — a record is a run of ``User-agent:`` lines followed
by its ``Allow:``/``Disallow:`` rules, and a ``User-agent:`` line that
follows a rule line STARTS A NEW record — so the parse is: explode
lines with positions, strip ``#`` comments, classify each line, mark
record starts with one lag window per domain, and assign record ids
with a running count. Agent selection follows the RFC's specificity
rule in simplified form: records naming the agent exactly
(case-insensitive) win; only if the domain has none do the ``*``
records apply; domains with neither yield no rules (allow-all).

``robots_allowed`` joins URLs against the (small — rules per domain
are dozens, not millions) rules table per domain and applies RFC 9309
longest-match: the rule whose path prefix is the LONGEST match
decides; on a tie between Allow and Disallow of equal length, Allow
wins; no matching rule (including an empty ``Disallow:`` — the
classic allow-all idiom, which matches nothing as a prefix rule)
means allowed. An absent robots.txt (domain not in the rules table)
is allowed — the RFC's unreachable-robots default.

Deliberately out of scope (documented, not silently wrong): the
``*``/``$`` wildcard extension (prefix semantics only — rules bearing
a ``*`` anywhere or the trailing ``$`` end-anchor are DROPPED and
reported by ``has_wildcard`` so callers can see what was skipped), ``Crawl-delay``/``Sitemap``
directives (ignored), percent-encoding equivalence.

Scale shape (100 TB frontier): robots bodies are per-DOMAIN (millions
of domains, bodies a few KB) — the parse explodes lines but stays
partition-local per domain (windows keyed by domain); the allow join
keys on domain and the rules side is small by nature, so AQE
broadcasts it against the frontier. Everything is built-in string/
window expressions — no Python in the hot path, fully value-oracle-
able (the line classification and longest-match are plain SQL)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def robots_rules(
    df: DataFrame,
    *,
    domain_column: str = "domain",
    robots_column: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """Parse robots.txt bodies into the rules that apply to ``agent``
    (module docstring). Returns one row per applicable rule:
    (domain, rule_order BIGINT, allow BOOLEAN, path_prefix STRING,
    has_wildcard BOOLEAN). Wildcard-bearing rules are returned flagged
    but must be excluded from prefix matching (``robots_allowed``
    drops them); empty-path rules are returned too (they match
    nothing — the allow-all idiom) so audits can see them."""
    agent_l = agent.lower()
    lines = df.select(
        F.col(domain_column).alias("domain"),
        F.posexplode(
            F.split(F.coalesce(F.col(robots_column), F.lit("")), "\n")
        ).alias("pos", "line"),
    )
    # strip comments + whitespace; classify. NOT F.trim — it strips
    # only ASCII spaces, and a CRLF-served robots.txt (the common
    # real-server case) leaves '\r' on every line after the '\n'
    # split: the UA value would become '*\r', match nothing, and the
    # gate would silently FAIL OPEN (code-review regression)
    def _wtrim(col: Column) -> Column:
        return F.regexp_replace(col, r"^[ \t\r]+|[ \t\r]+$", "")

    body = _wtrim(F.regexp_replace(F.col("line"), r"#.*", ""))
    key = F.lower(_wtrim(F.split_part(body, F.lit(":"), F.lit(1))))
    # value = everything after the FIRST ':' (paths may contain ':')
    value = _wtrim(
        F.regexp_replace(
            F.expr("substring(line, instr(line, ':') + 1)"), r"#.*", ""
        )
    )
    parsed = (
        lines.select(
            "domain",
            "pos",
            body.alias("body"),
            key.alias("key"),
            value.alias("value"),
        )
        # a directive needs its ':' — a bare 'User-agent' line is not
        # a record header
        .filter(
            F.col("body").contains(":")
            & F.col("key").isin("user-agent", "allow", "disallow")
        )
        .drop("body")
    )

    w = Window.partitionBy("domain").orderBy("pos")
    is_ua = F.col("key") == "user-agent"
    prev_is_ua = F.lag(is_ua, 1, False).over(w)
    parsed = parsed.withColumn(
        "rec",
        F.sum((is_ua & ~prev_is_ua).cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    # agent sets per record; a record with no UA line (rules before
    # any User-agent:) belongs to no agent and drops
    agents = (
        parsed.filter(is_ua)
        .groupBy("domain", "rec")
        .agg(
            F.max(
                (F.lower(F.col("value")) == agent_l).cast("int")
            ).alias("__exact"),
            F.max((F.col("value") == "*").cast("int")).alias("__star"),
        )
    )
    # exact-agent records win over '*' records PER DOMAIN
    dom_has_exact = agents.groupBy("domain").agg(
        F.max("__exact").alias("__dom_exact")
    )
    applicable = (
        agents.join(dom_has_exact, "domain")
        .filter(
            (F.col("__exact") == 1)
            | ((F.col("__dom_exact") == 0) & (F.col("__star") == 1))
        )
        .select("domain", "rec")
    )
    rules = (
        parsed.filter(~is_ua)
        .join(applicable, ["domain", "rec"])
        .select(
            "domain",
            F.col("pos").cast("long").alias("rule_order"),
            (F.col("key") == "allow").alias("allow"),
            F.col("value").alias("path_prefix"),
            # the RFC 9309 wildcard EXTENSION is both '*' anywhere and
            # a trailing '$' end-anchor — flag either so callers see
            # what prefix matching skipped (a '$'-anchored rule kept
            # as a literal prefix would be silently inert AND wrongly
            # deny paths literally starting with it)
            (
                F.col("value").contains("*")
                | F.col("value").endswith("$")
            ).alias("has_wildcard"),
        )
    )
    return rules


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    *,
    domain_column: str = "domain",
    path_column: str = "path",
) -> DataFrame:
    """RFC 9309 longest-match verdict per URL row (module docstring):
    adds ``allowed`` BOOLEAN (NULL when the path itself is NULL — an
    unparseable URL is never allowed by default), ``matched_rule``
    STRING (NULL when no rule matched), ``matched_allow`` BOOLEAN
    (NULL likewise).

    Plan shape: the usable rules COLLAPSE to one array per domain
    first (rules per domain are dozens, not millions), so the frontier
    join is one AQE-broadcastable hash join with NO row fan-out, and the
    longest-match pick is an array_max over (length, allow, prefix)
    structs — a narrow map, zero per-URL shuffles or windows. Equal-
    length Allow/Disallow ties go to Allow (the RFC rule); a residual
    tie between same-length same-verdict prefixes deterministically
    reports the bytewise-largest prefix."""
    r = (
        rules.filter(
            (~F.col("has_wildcard")) & (F.col("path_prefix") != "")
        )
        .groupBy(F.col("domain").alias("__rdom"))
        .agg(
            F.collect_list(
                F.struct(
                    F.col("path_prefix").alias("p"),
                    F.col("allow").alias("a"),
                )
            ).alias("__rules")
        )
    )
    # no forced broadcast: at the module's own stated scale (millions
    # of domains) the collapsed rules table can reach gigabytes, and a
    # forced broadcast would override AQE's size-based decision and
    # OOM exactly where the operator is documented to scale; AQE
    # broadcasts it whenever it actually is small (code-review
    # regression)
    joined = urls.join(
        r,
        F.col(domain_column) == F.col("__rdom"),
        "left",
    )
    path = F.col(path_column)
    matches = F.filter(
        F.coalesce(F.col("__rules"), F.array()),
        lambda x: path.startswith(x["p"]),
    )
    best = F.array_max(
        F.transform(
            matches,
            lambda x: F.struct(
                F.length(x["p"]).alias("l"),
                x["a"].alias("a"),
                x["p"].alias("p"),
            ),
        )
    )
    # a NULL path (url_parse failed) must NOT fail open: startswith(NULL)
    # is NULL, the filter drops every rule, and the coalesce default
    # would report allowed=TRUE for a URL the gate never actually
    # checked (ADVICE r13). Unparseable rows get allowed=NULL — a
    # compliance filter on allowed=TRUE visibly excludes them.
    return (
        joined.withColumn("__best", best)
        .withColumn(
            "allowed",
            F.when(
                path.isNotNull(),
                F.coalesce(F.col("__best.a"), F.lit(True)),
            ),
        )
        .withColumn("matched_rule", F.col("__best.p"))
        .withColumn("matched_allow", F.col("__best.a"))
        .drop("__rdom", "__rules", "__best")
    )


def synth_robots(domain_id: Column) -> Column:
    """Deterministic robots.txt fixture (the synth_url precedent):
    domain_id % 3 == 0 -> a two-record file (exact agent 'trainbot'
    disallows /private/ and /tmp/ but allows /private/ok/; '*'
    disallows everything); % 3 == 1 -> a '*'-only record with an
    empty Disallow (allow-all idiom) plus a wildcard rule that must
    be flagged and skipped; % 3 == 2 -> comments and a record with
    no rules. Plain concat — a SQL oracle rebuilds it."""
    sid = domain_id.cast("string")
    return (
        F.when(
            domain_id % 3 == 0,
            F.concat(
                F.lit(
                    "# synth robots\n"
                    "User-agent: TrainBot\n"
                    "Disallow: /private/\n"
                    "Allow: /private/ok/\n"
                    "Disallow: /tmp/\n"
                    "\n"
                    "User-agent: *\n"
                    "Disallow: /\n"
                ),
                F.lit("# trailing comment "),
                sid,
            ),
        )
        .when(
            domain_id % 3 == 1,
            F.concat(
                F.lit(
                    "User-agent: *\n"
                    "Disallow:\n"
                    "Disallow: /search*q=\n"
                    "Allow: /public/ # inline comment\n"
                ),
                F.lit("# id "),
                sid,
            ),
        )
        .otherwise(
            F.concat(
                F.lit("# nothing but comments\nUser-agent: LoneBot\n"),
                F.lit("# id "),
                sid,
            )
        )
    )
