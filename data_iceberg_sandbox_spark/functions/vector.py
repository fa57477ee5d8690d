"""Vector column expressions over embedding columns (array<float>).

Dot products / norms as **fixed-width unrolled expressions** when the
dimension is known (the common case — embeddings have a declared d):
``lit(0.0) + a[0]*b[0] + a[1]*b[1] + …`` is pure whole-stage-codegen
arithmetic, 10-50× faster than the ``F.aggregate`` higher-order fold,
which Spark executes *interpreted* per element. The association
(left-to-right, seeded 0.0) is bit-identical to the fold AND to
DuckDB's list_inner_product, so cosine scores stay bit-reproducible
across engines (cast to double first; final scores still rounded
defensively at the operator layer).

The HOF fold remains as the fallback for unknown/variable dims.

At 100 TB these expressions run inside whole-stage codegen per row —
no Python, no Arrow hop. For very wide vectors a Pandas-UDF BLAS path
could win; at d=64 the codegen'd unroll beats the Arrow transfer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Inner product. With ``dim``, an unrolled codegen expression whose
    float-addition order matches the seeded left fold exactly (the
    leading lit(0.0) keeps -0.0 first terms normalizing to +0.0, as the
    fold's zero seed does)."""
    if dim is not None:
        acc = F.lit(0.0)
        for i in range(dim):
            acc = acc + a[i] * b[i]
        return acc
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))
