"""Vector column expressions over embedding columns (array<float>).

Dot products / norms via ``F.zip_with`` + ``F.aggregate`` — sequential
left-to-right folds in element order, which makes the floating-point
sum order deterministic AND identical to DuckDB's list_inner_product,
so cosine scores are bit-reproducible across engines (cast to double
first; final scores still rounded defensively at the operator layer).

Performance: the hot-path win is NOT replacing the fold — a 64-term
unrolled `a[0]*b[0] + …` expression was MEASURED SLOWER end-to-end
(re-confirmed r11 at sf10: 6.15s vs 0.74s for 2M pairs — the single
giant generated method exceeds the JIT's compile limits and runs
bytecode-interpreted) — it is computing ``norm`` once per ROW instead
of once per PAIR (see operators/similarity._with_norm): one fold per
scored pair instead of three, ~1.6× on brute-force ANN, bit-identical
results. The measured JVM fold budget is ~0.4 µs/pair: fine up to
~10M pairs, and pair-quadratic paths beyond that (IVF assignment at
n×k) belong in an Arrow kernel (similarity._assign_cells) — BLAS
approximation to SELECT, sequential-fold refine to EMIT, exactly the
ann_cosine_topk recipe.

At 100 TB these expressions run per row with no Python and no Arrow
hop. For very wide vectors a Pandas-UDF BLAS path could win; at d=64
the fold + prenorm shape beats the Arrow transfer.
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
