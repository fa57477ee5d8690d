"""Interactive SQL entry point — the engine's `spark-sql` console analog
(reference §3.3: infra/README.md:91-108 runs ad-hoc SQL over the
catalog; Trino notebooks do the same through a second engine — here both
collapse to one Catalyst session).

Usage:
    python -m data_iceberg_sandbox_spark.cli -e "SELECT count(*) FROM lineitem"
    python -m data_iceberg_sandbox_spark.cli            # REPL, ; to end
    python -m data_iceberg_sandbox_spark.cli --sf-dir /root/testdata/sf0.01 \
        -e "SELECT * FROM region"

Registers the testdata tables as views plus any LakeTables found under
--warehouse (as `<ns>_<table>` views).
"""

from __future__ import annotations

import argparse
import sys

from .session import get_spark_session
from .sources.registry import DEFAULT_SF_DIR, register_views
from .tables.laketable import LakeCatalog


def _register_warehouse(spark, warehouse: str) -> list[str]:
    cat = LakeCatalog(spark, warehouse)
    names = []
    stack = [""]
    while stack:
        ns = stack.pop()
        for sub in cat.list_namespaces(ns):
            stack.append(f"{ns}.{sub}" if ns else sub)
        for t in cat.list_tables(ns):
            ident = f"{ns}.{t}" if ns else t
            view = ident.replace(".", "_")
            # distinct identifiers can flatten to one view name
            # ('a.b_c' vs 'a_b.c'), and a lake table could silently
            # shadow a just-registered testdata view — refuse instead
            # of last-writer-wins (r12 review)
            if view in names or spark.catalog.tableExists(view):
                raise ValueError(
                    f"warehouse table {ident!r} flattens to view "
                    f"{view!r}, which is already registered — rename "
                    "the table or mount it manually"
                )
            cat.table(ident).read().createOrReplaceTempView(view)
            names.append(view)
    return names


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="engine SQL console")
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--warehouse", default=None, help="LakeCatalog root to mount")
    ap.add_argument("-e", "--execute", action="append", help="statement(s) to run")
    ap.add_argument("--limit", type=int, default=20, help="max rows to print")
    args = ap.parse_args(argv)

    spark = get_spark_session(app_name="sql-console")
    register_views(spark, args.sf_dir)
    if args.warehouse:
        mounted = _register_warehouse(spark, args.warehouse)
        print(f"mounted lake tables: {', '.join(mounted) or '(none)'}")

    def run(stmt: str) -> bool:
        stmt = stmt.strip().rstrip(";")
        if not stmt:
            return True
        try:
            spark.sql(stmt).show(args.limit, truncate=False)
            return True
        except Exception as e:  # console surface: message, not traceback
            lines = [ln for ln in str(e).splitlines() if ln.strip()]
            msg = lines[0] if lines else repr(e)
            print(f"error: {type(e).__name__}: {msg}", file=sys.stderr)
            return False

    if args.execute:
        ok = all([run(stmt) for stmt in args.execute])
        return 0 if ok else 1

    print("engine SQL console — end statements with ';', exit with Ctrl-D")
    buf: list[str] = []
    ok = True
    try:
        for line in sys.stdin:
            buf.append(line)
            if line.rstrip().endswith(";"):
                ok = run(" ".join(buf)) and ok
                buf = []
    except KeyboardInterrupt:
        pass
    # flush a final un-';'-terminated statement instead of silently
    # dropping it and exiting 0 (r12 review: piped input without a
    # trailing semicolon never ran)
    if "".join(buf).strip():
        ok = run(" ".join(buf)) and ok
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
