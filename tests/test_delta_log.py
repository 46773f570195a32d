"""Minimal open-protocol Delta log reader/writer (sources/delta_log.py)
— S2/S3/S4 semantics without delta-spark: commit listing, history,
timestamp resolution, log-replay snapshots (JSON and checkpoint paths),
diff-derived change feed, protocol guard, optimistic concurrency. A
delta-spark cross-read auto-activates if the package ever installs."""

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from pyspark_unload_to_gcs_spark.sources import delta_log as D  # noqa: E402


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    """3-commit table over a tiny closed-form frame: v0 @ 1000 = even
    keys; v1 @ 2000 = ALL keys, +1.0 on k % 10 == 0 (update+insert);
    v2 @ 3000 = v1 minus k % 7 == 0 (delete) — the versioned-orders
    arms, on the open Delta format."""
    t = str(tmp_path_factory.mktemp("delta_tbl")) + "/t"
    base = spark.range(0, 40).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("c"),
        (F.col("id") * 10).cast("double").alias("p"),
    )
    v1 = base.withColumn(
        "p",
        F.col("p")
        + F.when(F.col("k") % 10 == 0, F.lit(1.0)).otherwise(F.lit(0.0)),
    )
    assert (
        D.write_delta_commit(
            base.filter(F.col("k") % 2 == 0), t, commit_ms=1000
        )
        == 0
    )
    assert (
        D.write_delta_commit(v1, t, commit_ms=2000, mode="overwrite") == 1
    )
    assert (
        D.write_delta_commit(
            v1.filter(F.col("k") % 7 != 0), t, commit_ms=3000,
            mode="overwrite",
        )
        == 2
    )
    return t


def _rows(df):
    return sorted(map(tuple, df.select("k", "c", "p").collect()))


def test_history_and_latest_timestamp(table):
    hist = D.table_history(table)
    assert [e["version"] for e in hist] == [0, 1, 2]
    assert [e["commit_ms"] for e in hist] == [1000, 2000, 3000]
    assert hist[0]["operation"] == "WRITE"
    assert hist[1]["operation"] == "OVERWRITE"
    assert D.latest_commit_timestamp_ms(table) == 3000


def test_version_at_timestamp_resolution(table):
    assert D.version_at_timestamp_ms(table, 1000) == 0
    assert D.version_at_timestamp_ms(table, 1999) == 0
    assert D.version_at_timestamp_ms(table, 2500) == 1
    assert D.version_at_timestamp_ms(table, 99999) == 2
    with pytest.raises(ValueError, match="at or before"):
        D.version_at_timestamp_ms(table, 999)


def test_snapshots_replay_each_version(spark, table):
    s0 = _rows(D.snapshot_at_version(spark, table, 0))
    assert s0 == sorted(
        (k, k % 5, float(k * 10)) for k in range(0, 40, 2)
    )
    s1 = _rows(D.snapshot_at_ms(spark, table, 2500))
    assert s1 == sorted(
        (k, k % 5, float(k * 10) + (1.0 if k % 10 == 0 else 0.0))
        for k in range(40)
    )
    s2 = _rows(D.snapshot_at_ms(spark, table, 3000))
    assert s2 == sorted(
        (k, k % 5, float(k * 10) + (1.0 if k % 10 == 0 else 0.0))
        for k in range(40)
        if k % 7 != 0
    )


def test_change_feed_by_diff_matches_closed_form(spark, table):
    feed = D.change_feed_by_diff(
        spark, table, 1500, 3000, key_columns=["k"]
    )
    got = sorted(
        map(
            tuple,
            feed.select(
                "_mp_change_type", "k", "p", "_commit_version",
                "_commit_timestamp",
            ).collect(),
        )
    )
    want = []
    for k in range(40):
        p = float(k * 10)
        if k % 2 == 1:  # v1 insert
            want.append(("INSERT", k, p + (1.0 if k % 10 == 0 else 0.0), 1, 2000))
        elif k % 10 == 0:  # v1 update pair
            want.append(("DELETE", k, p, 1, 2000))
            want.append(("INSERT", k, p + 1.0, 1, 2000))
        if k % 7 == 0:  # v2 delete at v1 price
            want.append(("DELETE", k, p + (1.0 if k % 10 == 0 else 0.0), 2, 3000))
    assert got == sorted(want)


def test_change_feed_window_past_log_is_empty(spark, table):
    feed = D.change_feed_by_diff(
        spark, table, 5000, 9000, key_columns=["k"]
    )
    assert feed.count() == 0
    assert "_mp_change_type" in feed.columns


def test_checkpoint_shortcuts_replay_identically(spark, table):
    D.write_checkpoint(spark, table, 1)
    assert D.checkpoint_versions(table) == [1]
    # replay from the checkpoint (v1) and through it (v2) must match
    # the pure-JSON replays bit for bit
    s1 = _rows(D.snapshot_at_version(spark, table, 1))
    s2 = _rows(D.snapshot_at_version(spark, table, 2))
    assert len(s1) == 40 and len(s2) == 40 - len(range(0, 40, 7))
    assert s2 == sorted(
        (k, k % 5, float(k * 10) + (1.0 if k % 10 == 0 else 0.0))
        for k in range(40)
        if k % 7 != 0
    )


def test_append_mode_adds_without_removing(spark, table, tmp_path):
    t = str(tmp_path) + "/t2"
    df = spark.range(0, 3).select(
        F.col("id").alias("k"), F.lit(0).alias("c"),
        F.lit(1.0).alias("p"),
    )
    D.write_delta_commit(df, t, commit_ms=100)
    D.write_delta_commit(
        df.withColumn("k", F.col("k") + 10), t, commit_ms=200
    )
    assert D.snapshot_at_version(
        df.sparkSession, t, 1
    ).count() == 6
    assert D.snapshot_at_version(df.sparkSession, t, 0).count() == 3


def test_empty_snapshot_keeps_schema(spark, tmp_path):
    t = str(tmp_path) + "/t3"
    df = spark.range(0, 2).select(
        F.col("id").alias("k"), F.lit(1.5).alias("p")
    )
    D.write_delta_commit(df, t, commit_ms=100)
    D.write_delta_commit(
        df.limit(0), t, commit_ms=200, mode="overwrite"
    )
    snap = D.snapshot_at_version(spark, t, 1)
    assert snap.count() == 0
    assert [f.name for f in snap.schema.fields] == ["k", "p"]


def test_protocol_guard_refuses_newer_reader(spark, table, tmp_path):
    t = str(tmp_path) + "/t4"
    df = spark.range(0, 2).select(F.col("id").alias("k"))
    D.write_delta_commit(df, t, commit_ms=100)
    # hand-craft a v1 commit demanding reader features we don't have
    import os

    log = os.path.join(t, "_delta_log")
    with open(os.path.join(log, f"{1:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 3}}) + "\n")
        f.write(
            json.dumps({"commitInfo": {"timestamp": 200}}) + "\n"
        )
    with pytest.raises(ValueError, match="minReaderVersion"):
        D.snapshot_at_version(spark, t, 1)


def test_commit_claim_is_exclusive(spark, table):
    with pytest.raises(Exception):
        D._create_exclusive(
            D._commit_file(table, 0), '{"commitInfo":{}}'
        )


def test_url_encoded_paths_decode(spark, tmp_path):
    """The protocol URL-encodes add.path; a literal %20 in the encoded
    form must resolve to the on-disk space."""
    import os

    t = str(tmp_path) + "/t5"
    df = spark.range(0, 2).select(F.col("id").alias("k"))
    D.write_delta_commit(df, t, commit_ms=100)
    # rename the data file to contain a space and rewrite the log with
    # the URL-encoded path
    files = [f for f in os.listdir(t) if f.endswith(".parquet")]
    assert files
    old = files[0]
    new = "part 0.parquet"
    os.rename(os.path.join(t, old), os.path.join(t, new))
    log_file = os.path.join(t, "_delta_log", f"{0:020d}.json")
    text = open(log_file).read().replace(old, "part%200.parquet")
    open(log_file, "w").write(text)
    # the commit was created through Hadoop's ChecksumFileSystem; a raw
    # rewrite invalidates its .crc sidecar — drop it (test-only
    # surgery; real logs are only ever written through the FS API)
    crc = os.path.join(t, "_delta_log", f".{0:020d}.json.crc")
    if os.path.exists(crc):
        os.remove(crc)
    assert D.snapshot_at_version(spark, t, 0).count() == 2


def test_delta_spark_cross_read_if_available(spark, table):
    """Auto-activating cross-validation: when delta-spark is present,
    its reader must see the same rows our writer committed."""
    try:
        import delta  # noqa: F401
    except ImportError:
        pytest.skip("delta-spark not installed (DNS-blocked env)")
    got = sorted(
        map(tuple, spark.read.format("delta").load(table).select("k", "c", "p").collect())
    )
    assert got == _rows(D.snapshot_at_version(spark, table, 2))


# --------------------------------------------------------------------------
# ADVICE r14: the reader refuses incomplete replays instead of silently
# misreading them, and the checkpoint writer emits the full spec schema
# --------------------------------------------------------------------------


def _mk_table(spark, root, n_commits=3):
    df = spark.range(0, 4).select(F.col("id").alias("k"))
    for v in range(n_commits):
        D.write_delta_commit(
            df.withColumn("k", F.col("k") + 10 * v),
            root,
            commit_ms=(v + 1) * 1000,
        )
    return root


def test_replay_refuses_commit_gap(spark, tmp_path):
    """A log-cleaned table (a commit below the replay floor vacuumed
    away) must raise, not replay a partial action set — the reader now
    enforces the same no-gap invariant the writer always had."""
    import os

    t = _mk_table(spark, str(tmp_path) + "/t")
    log = os.path.join(t, "_delta_log")
    os.remove(os.path.join(log, f"{1:020d}.json"))
    crc = os.path.join(log, f".{1:020d}.json.crc")
    if os.path.exists(crc):
        os.remove(crc)
    with pytest.raises(ValueError, match="missing from"):
        D.snapshot_at_version(spark, t, 2)


def test_unknown_checkpoint_format_refused(spark, tmp_path):
    """A checkpoint-shaped file this v1 reader does not understand (V2
    UUID checkpoint) raises instead of being skipped — skipping moves
    the replay floor below commits the checkpoint may have absorbed."""
    import os

    t = _mk_table(spark, str(tmp_path) + "/t")
    junk = os.path.join(
        t, "_delta_log", f"{1:020d}.checkpoint.abcdef0123456789.parquet"
    )
    open(junk, "wb").close()
    with pytest.raises(ValueError, match="does not understand"):
        D.snapshot_at_version(spark, t, 2)


def test_multipart_checkpoint_replays_and_incomplete_is_ignored(
    spark, tmp_path
):
    """The protocol's <v>.checkpoint.<i>.<n>.parquet spelling is
    readable when all parts exist; an INCOMPLETE part set is ignored
    (never an error and never a floor) so replay falls back to JSON."""
    import os
    import shutil

    t = _mk_table(spark, str(tmp_path) + "/t")
    D.write_checkpoint(spark, t, 1)
    log = os.path.join(t, "_delta_log")
    single = os.path.join(log, f"{1:020d}.checkpoint.parquet")
    part1 = os.path.join(
        log, f"{1:020d}.checkpoint.{1:010d}.{2:010d}.parquet"
    )
    # rename single -> part 1 of 2 (part 2 absent): incomplete, ignored
    shutil.move(single, part1)
    for extra in (f".{1:020d}.checkpoint.parquet.crc",):
        p = os.path.join(log, extra)
        if os.path.exists(p):
            os.remove(p)
    assert D.checkpoint_versions(t) == []
    assert D.snapshot_at_version(spark, t, 2).count() == 12
    # rename to a COMPLETE 1-of-1 multipart: listed and replayed
    part11 = os.path.join(
        log, f"{1:020d}.checkpoint.{1:010d}.{1:010d}.parquet"
    )
    shutil.move(part1, part11)
    assert D.checkpoint_versions(t) == [1]
    assert D.snapshot_at_version(spark, t, 2).count() == 12


def test_change_feed_refuses_untimed_commit(spark, tmp_path):
    """A spec-valid commit with no commitInfo.timestamp cannot be
    placed in or out of a change-feed window — raise, don't serve an
    incomplete feed."""
    import os

    t = _mk_table(spark, str(tmp_path) + "/t", n_commits=2)
    log = os.path.join(t, "_delta_log")
    with open(os.path.join(log, f"{2:020d}.json"), "w") as f:
        f.write(json.dumps({"commitInfo": {"operation": "EMPTY"}}) + "\n")
    with pytest.raises(ValueError, match="no\\s+.*commitInfo.timestamp"):
        D.change_feed_by_diff(
            spark, t, 0, 10_000, key_columns=["k"]
        )


def test_checkpoint_rows_carry_required_spec_fields(spark, tmp_path):
    """The checkpoint the writer emits must be consumable by an
    EXTERNAL spec reader: add.partitionValues present (empty map, not
    null) and the complete metaData struct carried forward."""
    t = _mk_table(spark, str(tmp_path) + "/t")
    D.write_checkpoint(spark, t, 2)
    cp = spark.read.parquet(
        str(tmp_path) + "/t/_delta_log/" + f"{2:020d}.checkpoint.parquet"
    )
    meta = [r for r in cp.collect() if r["metaData"] is not None]
    assert len(meta) == 1
    md = meta[0]["metaData"].asDict(recursive=True)
    assert md["id"] and md["format"]["provider"] == "parquet"
    assert md["partitionColumns"] == [] and md["schemaString"]
    assert md["createdTime"] == 1000
    adds = [r["add"].asDict() for r in cp.collect() if r["add"] is not None]
    assert adds and all(a["partitionValues"] == {} for a in adds)


# --------------------------------------------------------------------------
# Externally-shaped table fixture (VERDICT r14 "What's missing" #2): the
# reader validated only against its OWN writer could agree with it on a
# wrong reading of PROTOCOL.md. delta-spark is not installable here (DNS),
# so this fixture is authored INDEPENDENTLY of sources/delta_log.py:
# the commit JSON is hand-written to the delta-spark output shape (full
# metaData, commitInfo with engineInfo/txnId/operationMetrics, add.stats,
# spark-style part file names) and the data files are written by PYARROW
# in hive partition layout WITHOUT the partition column in the file —
# delta-spark's physical layout, which this repo's writer never produces
# (it always emits partitionColumns=[] and unpartitioned files). Expected
# rows are closed-form, computed by hand from the authored log.
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def foreign_table(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path_factory.mktemp("delta_foreign")) + "/t"
    log = Path(root) / "_delta_log"
    log.mkdir(parents=True)

    def _file(rel, ks):
        p = Path(root) / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        pq.write_table(pa.table({"k": pa.array(ks, pa.int32())}), p)
        return rel, p.stat().st_size

    f1, s1 = _file(
        "part=a/part-00000-11111111-2222-3333-4444-555555555555.c000"
        ".snappy.parquet",
        [1, 2],
    )
    f2, s2 = _file(
        "part=b/part-00001-66666666-7777-8888-9999-aaaaaaaaaaaa.c000"
        ".snappy.parquet",
        [3],
    )
    f3, s3 = _file(
        "part=a/part-00000-bbbbbbbb-cccc-dddd-eeee-ffffffffffff.c000"
        ".snappy.parquet",
        [4],
    )

    schema_string = json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "k",
                    "type": "integer",
                    "nullable": True,
                    "metadata": {},
                },
                {
                    "name": "part",
                    "type": "string",
                    "nullable": True,
                    "metadata": {},
                },
            ],
        }
    )

    def _commit(v, actions):
        with open(log / f"{v:020d}.json", "w") as f:
            for a in actions:
                f.write(json.dumps(a, separators=(",", ":")) + "\n")

    def _add(rel, size, pv, n):
        return {
            "add": {
                "path": rel,
                "partitionValues": pv,
                "size": size,
                "modificationTime": 1700000000000,
                "dataChange": True,
                "stats": json.dumps(
                    {"numRecords": n, "minValues": {}, "maxValues": {},
                     "nullCount": {}}
                ),
            }
        }

    _commit(
        0,
        [
            {
                "commitInfo": {
                    "timestamp": 1000,
                    "operation": "WRITE",
                    "operationParameters": {
                        "mode": "ErrorIfExists", "partitionBy": '["part"]'
                    },
                    "isolationLevel": "Serializable",
                    "isBlindAppend": True,
                    "operationMetrics": {
                        "numFiles": "2", "numOutputRows": "3",
                        "numOutputBytes": str(s1 + s2),
                    },
                    "engineInfo": "Apache-Spark/3.5.1 Delta-Lake/3.2.0",
                    "txnId": "0197a7d0-0000-4000-8000-000000000001",
                }
            },
            {"metaData": {
                "id": "8d3c2e10-1111-4222-8333-944445555666",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_string,
                "partitionColumns": ["part"],
                "configuration": {},
                "createdTime": 999,
            }},
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _add(f1, s1, {"part": "a"}, 2),
            _add(f2, s2, {"part": "b"}, 1),
        ],
    )
    _commit(
        1,
        [
            {
                "commitInfo": {
                    "timestamp": 2000,
                    "operation": "WRITE",
                    "operationParameters": {"mode": "Append"},
                    "isBlindAppend": True,
                    "engineInfo": "Apache-Spark/3.5.1 Delta-Lake/3.2.0",
                    "txnId": "0197a7d0-0000-4000-8000-000000000002",
                }
            },
            _add(f3, s3, {"part": "a"}, 1),
        ],
    )
    _commit(
        2,
        [
            {
                "commitInfo": {
                    "timestamp": 3000,
                    "operation": "DELETE",
                    "operationParameters": {
                        "predicate": '["(part = \'b\')"]'
                    },
                    "engineInfo": "Apache-Spark/3.5.1 Delta-Lake/3.2.0",
                    "txnId": "0197a7d0-0000-4000-8000-000000000003",
                }
            },
            {
                "remove": {
                    "path": f2,
                    "deletionTimestamp": 3000,
                    "dataChange": True,
                    "extendedFileMetadata": True,
                    "partitionValues": {"part": "b"},
                    "size": s2,
                }
            },
        ],
    )
    return root


def test_foreign_history_and_resolution(foreign_table):
    hist = D.table_history(foreign_table)
    assert [(e["version"], e["commit_ms"], e["operation"]) for e in hist] == [
        (0, 1000, "WRITE"), (1, 2000, "WRITE"), (2, 3000, "DELETE"),
    ]
    assert D.latest_commit_timestamp_ms(foreign_table) == 3000
    assert D.version_at_timestamp_ms(foreign_table, 2999) == 1


def test_foreign_snapshots_with_hive_partitions(spark, foreign_table):
    """Partition values come from the hive directory names (the data
    files do NOT carry the partition column — delta-spark's physical
    layout); the snapshot must surface them as a typed column."""
    def rows(v):
        return sorted(
            map(
                tuple,
                D.snapshot_at_version(spark, foreign_table, v)
                .select("k", "part")
                .collect(),
            )
        )

    assert rows(0) == [(1, "a"), (2, "a"), (3, "b")]
    assert rows(1) == [(1, "a"), (2, "a"), (3, "b"), (4, "a")]
    assert rows(2) == [(1, "a"), (2, "a"), (4, "a")]
    assert rows(2) == sorted(
        map(
            tuple,
            D.snapshot_at_ms(spark, foreign_table, 99999)
            .select("k", "part")
            .collect(),
        )
    )


def test_foreign_change_feed(spark, foreign_table):
    """The diff-derived feed over the authored log: v1 inserts k=4,
    v2 deletes k=3 — stamped with the authored commit timestamps."""
    feed = D.change_feed_by_diff(
        spark, foreign_table, 1001, 99999, key_columns=["k"]
    )
    got = sorted(
        map(
            tuple,
            feed.select(
                "k", "_mp_change_type", "_commit_version",
                "_commit_timestamp"
            ).collect(),
        )
    )
    assert got == [
        (3, "DELETE", 2, 3000),
        (4, "INSERT", 1, 2000),
    ]


def test_foreign_checkpoint_with_full_spec_schema(spark, foreign_table, tmp_path):
    """A checkpoint written by an EXTERNAL engine carries the full spec
    schema — extra top-level actions (txn) and extra nested fields
    (add.stats, add.tags, metaData struct) our own writer never emits.
    The reader must (a) replay from it bit-for-bit equal to the pure
    JSON replay, and (b) keep working when the commits BELOW the
    checkpoint are vacuumed away — the log-cleaning delta does in
    production and exactly the case the r15 gap-guard must NOT
    false-positive on."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    t = str(tmp_path) + "/t"
    shutil.copytree(foreign_table, t)
    baseline = sorted(
        map(
            tuple,
            D.snapshot_at_version(spark, t, 2).select("k", "part").collect(),
        )
    )

    # hand-build the v2 checkpoint in the delta-spark checkpoint shape:
    # one row per action, columns txn/add/remove/metaData/protocol
    schema_string = None
    adds = {}
    for v in (0, 1, 2):
        for a in D._read_actions(t, v):
            if "metaData" in a:
                md = a["metaData"]
                schema_string = md["schemaString"]
            if "add" in a:
                adds[a["add"]["path"]] = a["add"]
            if "remove" in a:
                adds.pop(a["remove"]["path"], None)

    txn_t = pa.struct(
        [("appId", pa.string()), ("version", pa.int64()),
         ("lastUpdated", pa.int64())]
    )
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string()),
            ("tags", pa.map_(pa.string(), pa.string())),
        ]
    )
    remove_t = pa.struct(
        [("path", pa.string()), ("deletionTimestamp", pa.int64()),
         ("dataChange", pa.bool_())]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("name", pa.string()),
            ("description", pa.string()),
            ("format", pa.struct(
                [("provider", pa.string()),
                 ("options", pa.map_(pa.string(), pa.string()))]
            )),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string())),
            ("createdTime", pa.int64()),
        ]
    )
    proto_t = pa.struct(
        [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
    )

    rows = [
        {"txn": None, "add": None, "remove": None,
         "metaData": None,
         "protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"txn": None, "add": None, "remove": None,
         "metaData": {
             "id": "8d3c2e10-1111-4222-8333-944445555666",
             "name": None, "description": None,
             "format": {"provider": "parquet", "options": []},
             "schemaString": schema_string,
             "partitionColumns": ["part"],
             "configuration": [], "createdTime": 999,
         },
         "protocol": None},
        # a txn action row — foreign engines checkpoint these; our
        # reader must pass over it without choking
        {"txn": {"appId": "stream-1", "version": 7,
                 "lastUpdated": 2500},
         "add": None, "remove": None, "metaData": None, "protocol": None},
    ]
    for rel in sorted(adds):
        a = adds[rel]
        rows.append(
            {
                "txn": None,
                "add": {
                    "path": a["path"],
                    "partitionValues": list(
                        (a.get("partitionValues") or {}).items()
                    ),
                    "size": a["size"],
                    "modificationTime": a["modificationTime"],
                    "dataChange": False,
                    "stats": a.get("stats"),
                    "tags": [],
                },
                "remove": None, "metaData": None, "protocol": None,
            }
        )
    table = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("txn", txn_t), ("add", add_t), ("remove", remove_t),
             ("metaData", meta_t), ("protocol", proto_t)]
        ),
    )
    pq.write_table(table, Path(t) / "_delta_log" / f"{2:020d}.checkpoint.parquet")
    with open(Path(t) / "_delta_log" / "_last_checkpoint", "w") as f:
        f.write(json.dumps({"version": 2, "size": len(rows)}))

    # (a) checkpoint replay == JSON replay
    assert sorted(
        map(
            tuple,
            D.snapshot_at_version(spark, t, 2).select("k", "part").collect(),
        )
    ) == baseline

    # (b) vacuum the commits below the checkpoint: still readable at
    # the checkpoint version (replay floor = 3, no JSON needed)
    for v in (0, 1):
        (Path(t) / "_delta_log" / f"{v:020d}.json").unlink()
    assert sorted(
        map(
            tuple,
            D.snapshot_at_version(spark, t, 2).select("k", "part").collect(),
        )
    ) == baseline

    # (c) vacuum EVERYTHING up to and including the checkpointed
    # commit's JSON: the checkpoint alone fully defines version 2, so
    # the snapshot must still serve (delta-spark semantics) — while a
    # version the checkpoint does NOT cover refuses
    (Path(t) / "_delta_log" / f"{2:020d}.json").unlink()
    assert sorted(
        map(
            tuple,
            D.snapshot_at_version(spark, t, 2).select("k", "part").collect(),
        )
    ) == baseline
    with pytest.raises(ValueError, match="not in"):
        D.snapshot_at_version(spark, t, 1)


# --------------------------------------------------------------------------
# Model-based log-replay fuzz: random commit sequences vs a dict model
# --------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# a step is (mode, key-set): append adds the rows, overwrite replaces
# the whole table with them
_STEP = st.tuples(
    st.sampled_from(["append", "overwrite"]),
    st.sets(st.integers(min_value=0, max_value=19), min_size=0, max_size=5),
)


@settings(max_examples=6, deadline=None)
@given(steps=st.lists(_STEP, min_size=1, max_size=4), cp_at=st.integers(0, 3))
def test_log_replay_matches_dict_model(spark, tmp_path_factory, steps, cp_at):
    """Apply a random append/overwrite sequence through
    write_delta_commit and replay EVERY version: the snapshot must
    equal a trivial Python dict-model of the log (append = bag union,
    overwrite = replace), with a checkpoint dropped mid-sequence to
    force the mixed checkpoint+JSON replay path. Multiplicity matters:
    appends of the same key accumulate rows."""
    t = str(tmp_path_factory.mktemp("delta_fuzz")) + "/t"
    model: list[list[int]] = []
    state: list[int] = []
    for i, (mode, keys) in enumerate(steps):
        rows = sorted(keys)
        df = spark.createDataFrame(
            [(k,) for k in rows] or [], "k int"
        )
        if i == 0:
            mode = "append"  # v0 defines the table
        D.write_delta_commit(df, t, commit_ms=(i + 1) * 1000, mode=mode)
        state = rows if mode == "overwrite" else sorted(state + rows)
        model.append(list(state))
        if i == min(cp_at, len(steps) - 1):
            D.write_checkpoint(spark, t, i)
    for v, expected in enumerate(model):
        got = sorted(
            r["k"] for r in D.snapshot_at_version(spark, t, v).collect()
        )
        assert got == expected, f"version {v}: {got} != {expected}"
        assert D.version_at_timestamp_ms(t, (v + 1) * 1000 + 500) == v
