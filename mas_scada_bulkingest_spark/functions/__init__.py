from .ids import name_uuid_expr, name_uuid_udf  # noqa: F401
from .text import normalize_text  # noqa: F401
from .tagpath import (  # noqa: F401
    last_segment,
    null_default,
    tag_from_alarm_source,
    ackby_from_alarm_source,
)
