from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def c(x) -> Column:
    """Accept a Column or a column name."""
    return x if isinstance(x, Column) else F.col(x)


def lit_or_col(x) -> Column:
    """Accept a Column, or a Python literal."""
    return x if isinstance(x, Column) else F.lit(x)
