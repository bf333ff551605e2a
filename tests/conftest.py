from __future__ import annotations

import shutil
import tempfile

import pandas as pd
import pytest

from mas_scada_bulkingest_spark.streaming.driver import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture()
def tmpdir_path():
    d = tempfile.mkdtemp(prefix="msbs-test-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def assert_frames_equal(actual: pd.DataFrame, expected: pd.DataFrame) -> None:
    """Value equality, tolerant of dtype-width differences (int32/int64,
    datetime64[us]/[ns]) that carry no semantic meaning."""
    pd.testing.assert_frame_equal(
        actual.reset_index(drop=True), expected.reset_index(drop=True), check_dtype=False
    )
