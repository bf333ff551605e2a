from .lww import collapse_lww, collapse_lww_window  # noqa: F401
from .classify import classify_expr  # noqa: F401
from .skew import hot_keys, salted_repartition  # noqa: F401
from .schema_evolution import align_schemas, merge_schemas  # noqa: F401
