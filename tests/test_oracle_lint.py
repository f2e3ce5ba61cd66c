"""Static lint over the DuckDB oracle strings — the oracle's RUNTIME
is part of every parity sweep's cost, and DuckDB plan traps are
invisible until a sweep hangs (gotcha #21: a 45-minute oracle checking
a 3-second Spark plan)."""

from __future__ import annotations

import re

from slowlog2clickhouse_spark.registry import all_ops


def test_no_non_equi_list_join_in_oracles():
    """Gotcha #21 as CI: `JOIN ... ON a.x < b.x AND list_has_any(...)`
    has no equi-key, so DuckDB block-nested-loops it and re-inlines
    the CTE expression chain into every probe. Any list_has_any that
    appears inside an ON clause with no `=` ahead of it is that trap;
    candidates must come from a MATERIALIZED unnest + equi-join
    (_CAND_EQUI_DUCK). list_has_any as a SELECT-list scalar is fine."""
    bad = []
    pat = re.compile(r"\bON\b(?:(?!=|\bWHERE\b|\bGROUP\b|\bSELECT\b).){0,200}?list_has_any", re.S)
    for name, o in all_ops().items():
        if o.oracle and pat.search(o.oracle):
            bad.append(name)
    assert not bad, f"non-equi list_has_any join in oracles: {bad}"


def test_recursive_ctes_materialize_their_candidate_input():
    """A WITH RECURSIVE oracle whose recursive term references an
    expensive derived CTE must pin it with AS MATERIALIZED, or DuckDB
    may re-evaluate the whole chain per iteration."""
    bad = []
    for name, o in all_ops().items():
        sql = o.oracle or ""
        if "WITH RECURSIVE" in sql and "cand AS" in sql:
            if "cand AS MATERIALIZED" not in sql:
                bad.append(name)
    assert not bad, f"recursive oracles with unmaterialized cand: {bad}"
