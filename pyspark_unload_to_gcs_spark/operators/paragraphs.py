"""Exact line-level dedup — the C4/RefinedWeb/MassiveText text-unit
pass that document-level dedup cannot express: boilerplate lines
("click here to subscribe", cookie banners, nav crumbs) repeat across
otherwise-distinct pages, and quoted/templated lines repeat inside one
page. Both hide from whole-document hashing.

``line_dedup`` splits each document on ``\\n``, keys every line on a
normalized form (trim, collapse ``[ \\t\\r]+`` runs, lowercase), or on
the raw line bytes with ``normalize=False`` (no trim, no collapse —
whitespace-distinct lines stay distinct), applies the scope rule, and
reassembles surviving lines in their original order:

- ``scope="corpus"``: any key whose TOTAL occurrence count across the
  corpus exceeds ``max_occurrences`` is boilerplate — every occurrence
  drops (the RefinedWeb rule: a line shared by many pages is noise on
  all of them, including the first).
- ``scope="document"``: within one document the first
  ``max_occurrences`` occurrences of a key survive and later repeats
  drop (intra-doc de-repetition keeps the content, cuts the echo).

Blank lines (key ``''`` — whitespace-only under normalization, truly
empty under raw keys) are document structure, never counted and never
dropped. NULL text stays NULL with NULL stats (an absent page is
not an empty page); a page whose every line dropped comes back as
``''`` — present but empty, so downstream length gates see it.

Scale shape (100 TB): the explode is narrow (id, pos, line — no
payload duplication). Corpus scope builds the over-the-threshold key
set with one groupBy and LEFT-JOINs it back — by Zipf that hot set is
tiny (boilerplate is the head of the line distribution), so AQE turns
the join into a broadcast at runtime; the alternative count-window
over every exploded line would shuffle the full corpus by key.
Document scope is one window partitioned by (id, key). Reassembly is
one groupBy(id) with an in-group sort_array — never a global sort.

Output is the 4-column frame (id, text_dedup, n_lines,
n_lines_removed); callers join back on the id. Precondition: ids are
unique (one row per document) — the reassembly groups by id, so
duplicate ids would merge documents.

Everything is built-in expressions end to end (split/posexplode_outer/
window/sort_array/concat_ws) — no Python in the hot path, and every
step has a direct SQL twin (unnest WITH ORDINALITY, count(*) OVER,
string_agg ORDER BY), keeping the operator fully value-oracle-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def line_dedup(
    df: DataFrame,
    *,
    id_column: str = "id",
    text_column: str = "text",
    scope: str = "corpus",
    max_occurrences: int = 1,
    normalize: bool = True,
    out_column: str = "text_dedup",
) -> DataFrame:
    """Line-level exact dedup (module docstring). Returns
    (id_column, out_column, n_lines, n_lines_removed); counts are
    BIGINT over non-NULL lines of present documents."""
    if scope not in ("corpus", "document"):
        raise ValueError(f"scope must be corpus|document, got {scope!r}")
    if max_occurrences < 1:
        raise ValueError("max_occurrences must be >= 1")

    ex = df.select(
        F.col(id_column).alias("__id"),
        F.posexplode_outer(F.split(F.col(text_column), "\n")).alias(
            "__pos", "__line"
        ),
    )
    if normalize:
        key = F.lower(
            F.trim(F.regexp_replace(F.col("__line"), r"[ \t\r]+", " "))
        )
    else:
        key = F.col("__line")
    ex = ex.withColumn("__key", key)
    blank = (F.col("__key") == "") | F.col("__key").isNull()

    if scope == "corpus":
        hot = (
            ex.filter(~blank)
            .groupBy(F.col("__key").alias("__hot_key"))
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .filter(F.col("__cnt") > max_occurrences)
        )
        ex = ex.join(
            hot, ex["__key"] == hot["__hot_key"], "left"
        ).withColumn(
            "__keep", blank | F.col("__hot_key").isNull()
        )
    else:
        rn = F.row_number().over(
            Window.partitionBy("__id", "__key").orderBy("__pos")
        )
        ex = ex.withColumn(
            "__keep", blank | (rn <= F.lit(max_occurrences))
        )

    present_line = F.col("__line").isNotNull()
    kept_struct = F.when(
        F.col("__keep") & present_line,
        F.struct(F.col("__pos"), F.col("__line")),
    )
    grouped = ex.groupBy("__id").agg(
        F.max(present_line).alias("__present"),
        F.concat_ws(
            "\n",
            F.transform(
                F.sort_array(F.collect_list(kept_struct)),
                lambda s: s["__line"],
            ),
        ).alias("__joined"),
        F.count(F.when(present_line, 1)).alias("__n_lines"),
        F.count(F.when(present_line & ~F.col("__keep"), 1)).alias(
            "__n_removed"
        ),
    )
    gate = F.col("__present")
    return grouped.select(
        F.col("__id").alias(id_column),
        F.when(gate, F.col("__joined")).alias(out_column),
        F.when(gate, F.col("__n_lines")).alias("n_lines"),
        F.when(gate, F.col("__n_removed")).alias("n_lines_removed"),
    )
