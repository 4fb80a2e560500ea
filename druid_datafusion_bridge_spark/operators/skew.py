"""Skew-mitigation joins.

AQE's skew-join splitting (on by default in session.py) handles most
skew at runtime; salted_join is the explicit tool for the pathological
case AQE can't fix — a single join key carrying a large fraction of all
rows (the classic hot-user/hot-null problem at 100 TB), where ONE task
would otherwise process that whole key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join robust to heavy key skew on the (large) left side.

    Left rows get a deterministic salt in [0, salt) hashed from the
    whole row, splitting a hot key across `salt` shuffle partitions;
    the right side is replicated `salt` times (use only when right is
    far smaller than left but too big / undesirable to broadcast).
    Result equals a plain `left.join(right, on, how)` for inner/left
    joins.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    lcols = [F.col(c) for c in left.columns]
    left_s = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*lcols), F.lit(salt)).cast("int")
    )
    right_s = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = left_s.join(right_s, [on, "__salt"], how)
    return out.drop("__salt")
