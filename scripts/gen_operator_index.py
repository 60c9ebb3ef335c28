"""Regenerate docs/OPERATORS.md from the registry.

Run from the repo root: ``python scripts/gen_operator_index.py``.
tests/test_conventions.py::test_operator_index_matches_registry fails if
the committed index drifts from the registry, so run this after adding
or renaming any operator.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

import uforwarder_spark  # noqa: F401  (import registers all operators)
from uforwarder_spark.registry import ORACLES, QUERIES

HEADER = """# Operator index

Generated from the registry: every `queries()` key with its module,
oracle status, and summary (first docstring sentence). Full semantics,
reference citations, and scale strategy live in each docstring;
`SURVEY.md` §2 maps keys to the reference inventory.

| key | module | oracle | summary |
| --- | --- | --- | --- |
"""


def summary(fn) -> str:
    doc = re.sub(r"\s+", " ", (fn.__doc__ or "").strip())
    return doc[:115]


def main() -> None:
    rows = []
    for key in sorted(QUERIES):
        fn = QUERIES[key]
        module = fn.__module__.removeprefix("uforwarder_spark.")
        oracle = "DuckDB" if key in ORACLES else "rows-only"
        rows.append(f"| `{key}` | {module} | {oracle} | {summary(fn)} |")
    with open("docs/OPERATORS.md", "w") as f:
        f.write(HEADER + "\n".join(rows) + "\n")
    print(f"wrote docs/OPERATORS.md with {len(rows)} rows")


if __name__ == "__main__":
    main()
