"""Deterministic name-based UUID (SURVEY.md F5).

The reference derives stable device identities with
``UUID.nameUUIDFromBytes((clientSite+":"+tagpath).getBytes())``
(DBConnector.java:476) — a type-3 (MD5) UUID over the raw name bytes with no
namespace prefix. Replay idempotence requires bit-exact reproduction.

Two implementations, verified identical in tests:

``name_uuid_expr``  (primary, JVM-side)
    Pure Column expression over ``md5(name)`` hex with nibble surgery for the
    version (byte 6 -> 0x3X) and variant (byte 8 -> 10XX XXXX) bits. Runs in
    whole-stage codegen — no Python in the hot path.

``name_uuid_udf``  (cross-check)
    Vectorized pandas UDF using the same MD5+bit-twiddle, matching Java's
    ``nameUUIDFromBytes`` and Python's ``uuid.UUID(bytes=..., version=3)``.
"""

from __future__ import annotations

import hashlib
import uuid

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def name_uuid_expr(col: Column | str) -> Column:
    """Type-3 UUID string from a name column, all in JVM expressions.

    Layout over the 32-char lowercase md5 hex ``h``:
    ``h[0:8]-h[8:12]-3h[13:16]-Vh[17:20]-h[20:32]`` where ``V`` is
    ``(h[16] & 0x3) | 0x8`` — i.e. the 13th hex digit is forced to '3'
    (version) and the 17th to one of 8/9/a/b (variant).
    """
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(c)
    # variant nibble: parse hex digit -> (d % 4) + 8 -> back to hex
    d = F.conv(F.substring(h, 17, 1), 16, 10).cast("int")
    variant = F.lower(F.conv((d % 4 + 8).cast("string"), 10, 16))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.concat(F.lit("3"), F.substring(h, 14, 3)),
        F.concat(variant, F.substring(h, 18, 3)),
        F.substring(h, 21, 12),
    )


@pandas_udf(StringType())
def name_uuid_udf(names: pd.Series) -> pd.Series:
    """Arrow-vectorized cross-check of :func:`name_uuid_expr`."""

    def one(name: str | None) -> str | None:
        if name is None:
            return None
        digest = bytearray(hashlib.md5(name.encode("utf-8")).digest())
        digest[6] = (digest[6] & 0x0F) | 0x30
        digest[8] = (digest[8] & 0x3F) | 0x80
        return str(uuid.UUID(bytes=bytes(digest)))

    return names.map(one)
