from .table_source import TableChangesDataSource  # noqa: F401
from .driver import (  # noqa: F401
    await_or_stop,
    build_session,
    replay_batches,
    run_stream,
    run_stream_adaptive,
    run_stream_debezium,
    run_stream_routed,
    supervise,
)
