"""Conversations registry: first-seen MERGE with putSafe semantics.

Mirrors the reference's entity-cache tests (TagDataTest.java): stable UUIDv3
identity (:151, :169), putSafe no-overwrite on duplicates (:179-188), and
registration flowing through the pipeline (Connector.java:127-146).
"""

from __future__ import annotations

import json
import uuid as _uuid
from datetime import datetime

from mas_scada_bulkingest_spark.operators.classify import (
    classify_expr,
    load_classifier_config,
)
from mas_scada_bulkingest_spark.pipeline import (
    apply_changes,
    create_conversations_registry,
    create_transcripts_table,
    register_conversations,
)

CHANGE_COLS = (
    "lsn long, op string, conv_id string, turn_idx int, role string,"
    " text string, tool string, ts timestamp_ntz"
)


def _t(s):
    return datetime(2024, 1, 1, 0, 0, s)


def test_register_putsafe_no_overwrite(spark, tmpdir_path):
    reg = create_conversations_registry(spark, tmpdir_path + "/r", n_buckets=2)
    mk = lambda rows: spark.createDataFrame(rows, CHANGE_COLS)
    st0 = register_conversations(
        reg, mk([(5, "insert", "conv-7", 0, "user", "a", None, _t(5))]), 0
    )
    assert st0.applied == 1
    row = reg.read().collect()[0]
    assert row["first_seen_lsn"] == 5 and row["first_seen_epoch"] == 0
    # later sighting in a later epoch: re-registration must NOT overwrite
    st1 = register_conversations(
        reg, mk([(9, "update", "conv-7", 1, "user", "b", None, _t(9))]), 1
    )
    assert st1.applied == 0 and st1.skipped == 1
    assert reg.read().collect()[0]["first_seen_lsn"] == 5
    # an EARLIER sighting delivered late corrects first_seen (true first)
    st2 = register_conversations(
        reg, mk([(2, "insert", "conv-7", 0, "user", "c", None, _t(2))]), 2
    )
    assert st2.applied == 1
    row = reg.read().collect()[0]
    assert row["first_seen_lsn"] == 2 and row["first_seen_epoch"] == 2


def test_register_uuid_and_classify(spark, tmpdir_path):
    reg = create_conversations_registry(spark, tmpdir_path + "/r", n_buckets=2)
    rows = [
        (1, "insert", "conv-3", 0, "user", "x", None, _t(1)),
        (2, "insert", "conv-42", 0, "user", "x", None, _t(2)),
        (3, "insert", "conv-13", 0, "user", "x", None, _t(3)),  # discarded
        (4, "insert", "conv-123", 0, "user", "x", None, _t(4)),
    ]
    register_conversations(reg, spark.createDataFrame(rows, CHANGE_COLS), 0)
    got = {r["conv_id"]: r for r in reg.read().collect()}
    assert got["conv-3"]["conv_type"] == "single"
    assert got["conv-42"]["conv_type"] == "double"
    assert got["conv-13"]["conv_type"] == "other"  # discard forces default
    assert got["conv-123"]["conv_type"] == "triple"
    # bit-exact UUIDv3 (reference UUID.nameUUIDFromBytes semantics)
    digest = bytearray(__import__("hashlib").md5(b"conv:conv-3").digest())
    digest[6] = (digest[6] & 0x0F) | 0x30
    digest[8] = (digest[8] & 0x3F) | 0x80
    assert got["conv-3"]["conv_uuid"] == str(_uuid.UUID(bytes=bytes(digest)))


def test_registry_maintained_by_apply_changes(spark, tmpdir_path):
    tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=2)
    reg = create_conversations_registry(spark, tmpdir_path + "/r", n_buckets=2)
    mk = lambda rows: spark.createDataFrame(rows, CHANGE_COLS)
    apply_changes(
        tbl,
        mk([(1, "insert", "conv-1", 0, "user", "x", None, _t(1)),
            (2, "insert", "conv-2", 0, "user", "y", None, _t(2))]),
        0,
        registry=reg,
    )
    assert reg.read().count() == 2
    # replaying the epoch is a no-op for BOTH tables (each has its own
    # commit-log entry for epoch 0)
    apply_changes(tbl, mk([(1, "insert", "conv-1", 0, "user", "x", None, _t(1))]), 0, registry=reg)
    assert reg.read().count() == 2
    assert "0" in reg.committed_epochs


def test_load_classifier_config(spark, tmpdir_path):
    cfg = {
        "patterns": [["hvac", "ca3/hvac/.*"], ["boiler", "ca3/boiler/.*"]],
        "discard": ["ca3/hvac/secret.*"],
        "default_type": "misc",
    }
    p = tmpdir_path + "/connection.json"
    with open(p, "w") as f:
        json.dump(cfg, f)
    patterns, discard, default = load_classifier_config(p)
    df = spark.createDataFrame(
        [("ca3/hvac/zone1",), ("ca3/boiler/temp",), ("ca3/hvac/secret1",), ("other/x",)],
        "tag string",
    )
    got = [
        r["cls"]
        for r in df.select(
            classify_expr("tag", patterns, discard=discard, default_type=default).alias("cls")
        ).collect()
    ]
    assert got == ["hvac", "boiler", "misc", "misc"]
