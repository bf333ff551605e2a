from .ids import name_uuid_expr, name_uuid_udf  # noqa: F401
from .text import normalize_text  # noqa: F401
from .tagpath import (  # noqa: F401
    ackby_from_alarm_source,
    last_segment,
    null_default,
    path_levels,
    tag_from_alarm_source,
)
