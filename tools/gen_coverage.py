#!/usr/bin/env python
"""Regenerate SURVEY.md §8 (operator-ID → queries coverage map) from the
query registry's `survey=` tags. Run after adding/retagging queries."""

from __future__ import annotations

import re
from collections import defaultdict
from pathlib import Path

SURVEY = Path(__file__).resolve().parent.parent / "SURVEY.md"

ORDER = (
    [f"S{i}" for i in range(1, 17)]
    + [f"P{i}" for i in range(1, 13)]
    + [f"J{i}" for i in range(1, 17)]
    + [f"A{i}" for i in range(1, 13)]
    + [f"W{i}" for i in range(1, 6)]
    + [f"O{i}" for i in range(1, 5)]
    + [f"U{i}" for i in range(1, 4)]
    + [f"F{i}" for i in range(1, 16)]
    + [f"K{i}" for i in range(1, 19)]
    + [f"T{i}" for i in range(1, 6)]
)

HEADER = """## 8. Coverage map (auto-generated from the query registry)

Every §2 operator ID → the `queries()` entries that exercise it.
Entries marked *(rows-only)* have no SQL twin (sequential/stateful/
RNG kernels per §7.3) and get the driver's weaker check; all others
are value-hash-checked against DuckDB. S15 (zip+rclone upload) is an
ops script, out of engine scope (§2.1).

| ID | Queries |
|---|---|
"""


def main() -> None:
    from nzgmdb_spark.queries import load_registry

    registry = load_registry()
    by_id: dict[str, list[str]] = defaultdict(list)
    for name, spec in sorted(registry.items()):
        label = name if spec.sql is not None else f"{name} (rows-only)"
        for sid in spec.survey:
            by_id[sid].append(label)

    rows = []
    for sid in ORDER:
        entries = ", ".join(by_id[sid]) if by_id[sid] else (
            "— out of scope (ops upload script)" if sid == "S15" else "—"
        )
        rows.append(f"| {sid} | {entries} |")

    n_total = len(registry)
    n_oracle = sum(1 for s in registry.values() if s.sql is not None)
    section = HEADER + "\n".join(rows) + (
        f"\n\n{n_total} registered queries; {n_oracle} oracle-checked.\n"
    )

    text = SURVEY.read_text()
    text = re.sub(
        r"## 8\. Coverage map.*\Z", section, text, flags=re.DOTALL
    )
    SURVEY.write_text(text)
    print(f"SURVEY.md §8 regenerated: {n_total} queries, {n_oracle} oracle-checked")


if __name__ == "__main__":
    main()
