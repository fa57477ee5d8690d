"""Vector column expressions over embedding columns (array<float>).

Dot products / norms via ``F.zip_with`` + ``F.aggregate`` — sequential
left-to-right folds in element order, which makes the floating-point
sum order deterministic AND identical to DuckDB's list_inner_product,
so cosine scores are bit-reproducible across engines (cast to double
first; final scores still rounded defensively at the operator layer).

At 100 TB these expressions run inside whole-stage codegen per row —
no Python, no Arrow hop. For very wide vectors a Pandas-UDF BLAS path
could win; at d=64 the codegen'd fold is faster than the Arrow transfer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
