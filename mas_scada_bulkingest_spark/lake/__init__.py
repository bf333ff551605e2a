from .base import LakeTable  # noqa: F401
from .iceberg import IcebergTable, iceberg_available  # noqa: F401
from .snapshot_table import (  # noqa: F401
    ConcurrentCommitError,
    ConstraintViolationError,
    MergeStats,
    SnapshotTable,
)
from .txn import (  # noqa: F401
    MultiTableTransaction,
    TransactionError,
    recover as recover_transactions,
)

#: the bundled LakeTable implementation under its descriptive name
ParquetSnapshotTable = SnapshotTable
