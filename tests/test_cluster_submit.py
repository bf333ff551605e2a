"""Deployment-path regression: the engine must run via ``spark-submit
--py-files mas_scada_bulkingest_spark.zip`` on a multi-executor cluster
(README cluster recipe; north_rule "run via spark-submit --py-files").

This pins two properties the in-process suite cannot:

* **zip-resolvable imports** — the child runs with ``PYTHONPATH`` scrubbed,
  so any accidental dependency on repo-relative files (config read via a
  path next to the module, data files not in the package) fails here first;
* **separate-executor correctness** — ``local-cluster[2,1,1024]`` launches
  two single-core executor JVMs that exchange shuffle blocks over Netty;
  the replayed final state must value-hash identically to the same replay
  computed in one JVM (the session fixture).

Skipped (not failed) if no spark-submit binary is on this machine.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest
from pyspark.sql import functions as F

from mas_scada_bulkingest_spark.pipeline import create_transcripts_table
from mas_scada_bulkingest_spark.sources.changelog_gen import generate_changelog
from mas_scada_bulkingest_spark.streaming.driver import replay_batches

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """\
import json, sys
from mas_scada_bulkingest_spark.pipeline import create_transcripts_table
from mas_scada_bulkingest_spark.streaming.driver import build_session, replay_batches
from pyspark.sql import functions as F

changes, table_path = sys.argv[1], sys.argv[2]
spark = build_session(
    master="local-cluster[2,1,1024]",
    shuffle_partitions=2,
    extra_conf={"spark.executor.memory": "768m",
                "spark.ui.showConsoleProgress": "false"},
)
spark.sparkContext.setLogLevel("ERROR")
table = create_transcripts_table(spark, table_path, n_buckets=4, mode="mor")
replay_batches(spark, changes, table, files_per_epoch=2)
lines = (table.read().orderBy("conv_id", "turn_idx")
         .select(F.concat_ws("|", "conv_id", F.col("turn_idx").cast("string"),
                             "text").alias("line"))
         .collect())
import hashlib
digest = hashlib.md5("\\n".join(r["line"] for r in lines).encode()).hexdigest()
spark.stop()
print(json.dumps({"rows": len(lines), "digest": digest}))
"""


def _spark_submit() -> str | None:
    for cand in (shutil.which("spark-submit"), "/opt/spark/bin/spark-submit"):
        if cand and os.path.exists(cand):
            return cand
    return None


def _zip_engine(dest_dir: str) -> str:
    zpath = os.path.join(dest_dir, "mas_scada_bulkingest_spark.zip")
    pkg = os.path.join(REPO, "mas_scada_bulkingest_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".pyc"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.skipif(_spark_submit() is None, reason="no spark-submit binary")
def test_spark_submit_pyfiles_cluster_matches_inprocess(spark, tmpdir_path):
    changes = os.path.join(tmpdir_path, "changes")
    generate_changelog(changes, n_convs=400, mean_turns=5, n_files=4, seed=11)

    # expected state from the in-process session (one JVM, 8 threads)
    local_tbl = create_transcripts_table(
        spark, os.path.join(tmpdir_path, "t_local"), n_buckets=4, mode="mor"
    )
    replay_batches(spark, changes, local_tbl, files_per_epoch=2)
    lines = (
        local_tbl.read().orderBy("conv_id", "turn_idx")
        .select(F.concat_ws(
            "|", "conv_id", F.col("turn_idx").cast("string"), "text"
        ).alias("line"))
        .collect()
    )
    expected_rows = len(lines)
    expected_digest = hashlib.md5(
        "\n".join(r["line"] for r in lines).encode()
    ).hexdigest()

    child = os.path.join(tmpdir_path, "child.py")
    with open(child, "w") as fh:
        fh.write(_CHILD)
    out = subprocess.run(
        [_spark_submit(), "--py-files", _zip_engine(tmpdir_path),
         "--conf", "spark.driver.memory=1g",
         child, changes, os.path.join(tmpdir_path, "t_cluster")],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "PYTHONPATH": "",
             "SPARK_WORKER_DIR": os.path.join(tmpdir_path, "wk"),
             "SPARK_LOG_DIR": os.path.join(tmpdir_path, "lg")},
    )
    result = None
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            result = json.loads(line)
            break
    assert result is not None, f"child produced no result:\n{out.stderr[-2000:]}"
    assert result["rows"] == expected_rows > 0
    assert result["digest"] == expected_digest, (
        "cluster-mode final state diverges from in-process state"
    )


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
