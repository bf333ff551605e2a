from .base import LakeTable  # noqa: F401
from .iceberg import IcebergTable, iceberg_available  # noqa: F401
from .snapshot_table import MergeStats, SnapshotTable  # noqa: F401

#: the bundled LakeTable implementation under its descriptive name
ParquetSnapshotTable = SnapshotTable
