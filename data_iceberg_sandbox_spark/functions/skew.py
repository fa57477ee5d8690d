"""Skew mitigation: salted joins.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; explicit salting is the deterministic fallback when a known hot
key would still overwhelm AQE's split heuristics (e.g. a null-like
sentinel key owning 30% of a 100 TB fact table).

``salted_join(left, right, key, n_salts)``: the skewed (left) side gets
a random salt in [0, n) appended to the key; the small (right) side is
replicated n× with every salt value (explode of a literal range). The
join key becomes (key, salt) — the hot key's rows spread over n
reducers. Row-level semantics are identical to the plain equi-join
(verified by tests); aggregations downstream are unaffected because the
salt column is dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_SALT_SAFE_JOINS = {"inner", "left", "left_outer", "left_semi", "left_anti"}


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Left-preserving joins only: the right side is replicated n_salts×,
    so right/full outer modes would emit each unmatched right row once
    per salt replica — refuse them instead of silently duplicating."""
    if how not in _SALT_SAFE_JOINS:
        raise ValueError(
            f"salted_join supports {sorted(_SALT_SAFE_JOINS)}, not {how!r}: "
            "the replicated right side breaks right/full-outer semantics"
        )
    salt = (F.rand(seed=42) * n_salts).cast("int")
    left_s = left.withColumn("_salt", salt)
    right_s = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = left_s.join(
        right_s,
        (left_s[left_key] == right_s[right_key]) & (left_s["_salt"] == right_s["_salt"]),
        how,
    )
    return out.drop("_salt")
