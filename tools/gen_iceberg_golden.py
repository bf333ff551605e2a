"""Golden-SQL corpus generator for the :class:`IcebergTable` builders.

``IcebergTable`` (``lake/iceberg.py``) generates DDL/MERGE/CALL text that
activates only when the Iceberg runtime jar is on the classpath — which it
never is in this sandbox.  To make semantic drift in the generated SQL a
REVIEWABLE DIFF rather than a silent change, every pure builder's output
for one canonical table configuration is snapshotted under
``tests/golden_iceberg/`` and pinned by ``tests/test_iceberg_golden.py``.

Regenerate intentionally with::

    python tools/gen_iceberg_golden.py        # rewrites the corpus
    git diff tests/golden_iceberg/            # review the contract change

The corpus is deterministic: the one time-dependent builder
(``expire_snapshots_sql``) is normalized by replacing its embedded
wall-clock horizon with a placeholder before writing/comparing.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mas_scada_bulkingest_spark.lake.iceberg import IcebergTable  # noqa: E402

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "golden_iceberg",
)

#: canonical configuration: the engine's transcript table per
#: BASELINE.json input_hint, as it would exist in a REST/Hive/Glue catalog
IDENTIFIER = "cat.db.transcripts"
KEY = ("conv_id", "turn_idx")
ORDER = ("ts", "lsn")
N_BUCKETS = 16
COLUMNS_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp, lsn bigint, metadata string"
)
#: value columns as merge_changes derives them from a batch that carries
#: the collapse helper _max_lsn — the builder must strip the helper
VALUE_COLS = ["role", "text", "tool", "ts", "lsn", "metadata", "_max_lsn"]

_TS_RE = re.compile(r"TIMESTAMP '\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}'")


def normalize(sql: str) -> str:
    """Replace the one wall-clock-dependent literal with a placeholder."""
    return _TS_RE.sub("TIMESTAMP '<NOW - older_than_secs>'", sql)


def _table() -> IcebergTable:
    # constructor refuses without the runtime jar; the builders are pure
    t = object.__new__(IcebergTable)
    t.identifier = IDENTIFIER
    t._key = KEY
    t._order = ORDER
    t._n_buckets = N_BUCKETS
    return t


def build_corpus() -> dict[str, str]:
    """name -> normalized SQL text, one entry per pure builder."""
    t = _table()
    conf_key, conf_val = IcebergTable.epoch_commit_conf(42)
    corpus = {
        "create_table": IcebergTable.create_sql(
            IDENTIFIER, COLUMNS_DDL, bucket_key=KEY[0], n_buckets=N_BUCKETS
        ),
        "create_table_cow": IcebergTable.create_sql(
            IDENTIFIER,
            COLUMNS_DDL,
            bucket_key=KEY[0],
            n_buckets=N_BUCKETS,
            merge_on_read=False,
        ),
        "merge_epoch": t.merge_sql("changes_v", VALUE_COLS),
        "epoch_commit_conf": f"SET {conf_key} = {conf_val}",
        "epoch_committed_probe": t.epoch_committed_sql(42),
        "epoch_snapshots_range": t.epoch_snapshots_sql(10, 20),
        "epoch_snapshots_open": t.epoch_snapshots_sql(10),
        "changelog_view": t.create_changelog_view_sql(
            start_snapshot_id=1234, end_snapshot_id=5678
        ),
        "changelog_view_minimal": t.create_changelog_view_sql(
            compute_updates=False
        ),
        "update_where": t.update_sql(
            "turn_idx = 5", {"text": "upper(text)", "tool": "NULL"}
        ),
        "purge_tombstones": t.purge_tombstones_sql(),
        "purge_tombstones_horizon": t.purge_tombstones_sql(before_lsn=99000),
        "tag": t.tag_sql("rc-1"),
        "tag_at_version": t.tag_sql("rc-1", version=7),
        "delete_tag": t.delete_tag_sql("rc-1"),
        "create_branch": t.create_branch_sql("audit"),
        "fast_forward": t.fast_forward_sql("audit"),
        "drop_column": t.drop_column_sql("tool"),
        "rename_column": t.rename_column_sql("tool", "tool_name"),
        "sort_order": t.sort_order_sql(),
        "rewrite_data_files": t.rewrite_data_files_sql(),
        "rewrite_data_files_scoped": t.rewrite_data_files_sql(
            where="ts < TIMESTAMP '2024-06-01 00:00:00'"
        ),
        "expire_snapshots": normalize(
            t.expire_snapshots_sql(older_than_secs=86400.0, retain_last=3)
        ),
        "select_at_timestamp": t.select_at_timestamp_sql(
            "2024-06-01 00:00:00"
        ),
        "files_metadata": t.files_sql(),
        "partitions_metadata": t.partitions_sql(),
    }
    # non-SQL contract surfaces, pinned as key=value lines
    corpus["changes_scan_options"] = "\n".join(
        f"{k}={v}"
        for k, v in sorted(t.changes_scan_options(1234, 5678).items())
    )
    corpus["spj_conf"] = "\n".join(
        f"{k}={v}" for k, v in sorted(IcebergTable.spj_conf().items())
    )
    return corpus


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    corpus = build_corpus()
    for name, text in corpus.items():
        with open(os.path.join(GOLDEN_DIR, f"{name}.sql"), "w") as f:
            f.write(text.rstrip("\n") + "\n")
    stale = [
        fn
        for fn in os.listdir(GOLDEN_DIR)
        if fn.endswith(".sql") and fn[: -len(".sql")] not in corpus
    ]
    for fn in stale:
        os.unlink(os.path.join(GOLDEN_DIR, fn))
    print(f"wrote {len(corpus)} golden files to {GOLDEN_DIR}"
          + (f"; removed stale: {stale}" if stale else ""))


if __name__ == "__main__":
    main()
