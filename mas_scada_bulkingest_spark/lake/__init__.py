from .snapshot_table import SnapshotTable, MergeStats  # noqa: F401
