"""Vectorized text normalization (BASELINE.json north_star: "all text
normalization and change-record parsing run as vectorized Arrow/pandas UDFs
with zero per-row Python").

The reference's only text handling is ``lower(tagpath)`` and comma
sanitization (DBConnector.java:430, 602); transcripts need real normalization:
Unicode NFC, whitespace collapse, strip. Implemented over pandas ``.str``
vectorized ops — no per-row Python function calls in the UDF body.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


@pandas_udf(StringType())
def normalize_text(texts: pd.Series) -> pd.Series:
    s = texts.str.normalize("NFC")
    s = s.str.replace(r"\s+", " ", regex=True)
    return s.str.strip()
