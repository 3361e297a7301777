"""Grouped-agg pandas UDFs (SURVEY §2.11).

NOTE: deliberately NO ``from __future__ import annotations`` here —
pandas_udf resolves real type hints to infer the UDF kind, and
stringified annotations break that inspection.
"""

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


@F.pandas_udf(DoubleType())
def median_udf(v: pd.Series) -> float:
    """Exact median as an Arrow grouped aggregate."""
    return float(v.median())
