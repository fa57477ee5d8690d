"""Thin access-control layer (SURVEY §2.8 D9).

The reference enforces table/column access through OPA + OpenFGA wired
into Trino and Lakekeeper (/root/reference/infra/opa-policies/trino/
allow_table.rego:73-109 maps SQL operations to privileges;
03-Trino-query.ipynb cells assert PERMISSION_DENIED). That is an infra
tier; the engine-level analog is policy-applied *secure views*: a
principal's scan of a table is rewritten to allowed columns, a mandatory
row filter, and masking expressions — the same mechanism Spark's own
row/column-level security extensions use, applied before any user
expression so Catalyst pushes the policy filter into the scan.

Not a sandbox: this guards the query surface, not the filesystem.
"""

from __future__ import annotations

from collections.abc import Callable

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class PermissionDenied(RuntimeError):
    pass


@dataclass
class TablePolicy:
    """Per-(principal, table) rules. `columns=None` → all columns."""

    columns: list[str] | None = None
    row_filter: Column | None = None
    masks: dict[str, Column] = field(default_factory=dict)


class AccessController:
    def __init__(self) -> None:
        self._policies: dict[tuple[str, str], TablePolicy] = {}

    def grant(self, principal: str, table: str, policy: TablePolicy | None = None):
        self._policies[(principal, table)] = policy or TablePolicy()

    def revoke(self, principal: str, table: str) -> None:
        self._policies.pop((principal, table), None)

    def secure_view(self, principal: str, table: str, df: DataFrame) -> DataFrame:
        """The principal's view of `df`: raises PermissionDenied without a
        grant; otherwise applies row filter → masks → column projection
        (in that order, so masked columns can still be filtered on their
        true values only by the policy itself, never the user)."""
        pol = self._policies.get((principal, table))
        if pol is None:
            raise PermissionDenied(f"{principal} has no grant on {table}")
        out = df
        if pol.row_filter is not None:
            out = out.filter(pol.row_filter)
        for col, mask in pol.masks.items():
            # fail CLOSED (r12 review): a typo'd mask column must raise,
            # not silently leave the real column unmasked — the same
            # loud contract pol.columns already has below
            if col not in out.columns:
                raise PermissionDenied(
                    f"policy for {principal}@{table} masks absent "
                    f"column {col!r}"
                )
            out = out.withColumn(col, mask)
        if pol.columns is not None:
            missing = [c for c in pol.columns if c not in out.columns]
            if missing:
                raise PermissionDenied(
                    f"policy for {principal}@{table} references absent columns {missing}"
                )
            out = out.select(*pol.columns)
        return out


def mask_string(prefix_keep: int = 0) -> "Callable[[str], Column]":
    """Masking expression FACTORY: returns a column-name → Column
    callable (use as ``mask_string(8)("c_name")``). The annotation was
    ``-> Column`` (r13 review), which invited
    ``masks={"c_name": mask_string(8)}`` — a function where
    TablePolicy.masks expects a Column, failing at view build with an
    opaque py4j TypeError."""

    def apply(col: str) -> Column:
        c = F.col(col)
        if prefix_keep <= 0:
            return F.lit("***")
        return F.concat(F.substring(c, 1, prefix_keep), F.lit("***"))

    return apply
