"""Regenerate OPERATORS.md from the registry (one line per op:
name, check kind, first docstring line)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from slowlog2clickhouse_spark.registry import all_ops  # noqa: E402


def main() -> None:
    ops = all_ops()
    lines = [
        "# Operator index (generated from the registry)",
        "",
        f"{len(ops)} registered operators; `oracle` = DuckDB-hash-checked by the",
        "driver contract, `rows` = rows-only check with pytest-pinned semantics.",
        "Regenerate: `python scripts/gen_operator_index.py`.",
        "",
    ]
    for name, o in ops.items():
        kind = "oracle" if o.oracle else "rows"
        doc = (o.doc or "").strip().split("\n")[0].rstrip()
        assert doc, f"operator {name} has no docstring"
        lines.append(f"- **`{name}`** ({kind}) — {doc}")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "OPERATORS.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote OPERATORS.md ({len(ops)} ops)")


if __name__ == "__main__":
    main()
