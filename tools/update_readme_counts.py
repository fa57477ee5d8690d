"""Regenerate the README correctness-count line from __spark_entry__.

VERDICT r3/r4 flagged hand-maintained counts rotting twice; this makes
them derived. Run from the repo root before committing:

    python tools/update_readme_counts.py

Rewrites the block between COUNTS:BEGIN / COUNTS:END markers.
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    import __spark_entry__ as entry_mod

    n_q = len(entry_mod.queries())
    n_o = len(entry_mod.oracle_sql())
    rows_only = n_q - n_o
    line = (
        f"{n_o} of {n_q} queries are oracle-checked; "
        + (
            "the rows-only set is empty."
            if rows_only == 0
            else f"{rows_only} run a weaker rows-only check."
        )
    )
    path = os.path.join(ROOT, "README.md")
    with open(path) as f:
        text = f.read()
    new = re.sub(
        r"(<!-- COUNTS:BEGIN[^>]*-->\n).*?(\n<!-- COUNTS:END -->)",
        lambda m: m.group(1) + line + m.group(2),
        text,
        flags=re.S,
    )
    if new != text:
        with open(path, "w") as f:
            f.write(new)
        print(f"README updated: {line}")
    else:
        print(f"README already current: {line}")


if __name__ == "__main__":
    main()
