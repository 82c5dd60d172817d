"""Pandas-UDF text kernels that need real (non-postponed) type hints.

NOTE: no ``from __future__ import annotations`` here — pandas_udf
resolves the Series hints at decoration time and postponed annotations
turn them into strings it cannot interpret.
"""

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

# ASCII-only domain grammar — the PRE-IDNA pattern the reference
# matches first (DOMAIN_REGEX, src/marshmallow/validate.py:239-247).
ASCII_DOMAIN = re.compile(
    r"(?:[A-Z0-9](?:[A-Z0-9-]{0,61}[A-Z0-9])?\.)+"
    r"(?:[A-Z]{2,6}|[A-Z0-9-]{2,})\Z"
    r"|^\[(25[0-5]|2[0-4]\d|[0-1]?\d?\d)"
    r"(\.(25[0-5]|2[0-4]\d|[0-1]?\d?\d)){3}\]\Z",
    re.IGNORECASE,
)


def _domain_ok(d):
    if d is None:
        return False
    if ASCII_DOMAIN.match(d):
        return True
    try:
        encoded = d.encode("idna").decode("ascii")
    except UnicodeError:
        return False
    return bool(ASCII_DOMAIN.match(encoded))


def idna_domain_ok(domain_col: Column) -> Column:
    """Boolean Column: domain matches the ASCII grammar directly or
    after IDNA encoding — the reference's exact fallback
    (src/marshmallow/validate.py:272-279), Arrow-batched.

    The UDF is created inside this function: decorating at module
    level would re-run pandas_udf() during worker-side module import,
    where no SparkContext exists."""

    def check(s: pd.Series) -> pd.Series:
        return s.map(_domain_ok)

    return pandas_udf(check, "boolean")(domain_col)
