"""Canonical cross-engine result comparison.

Mirrors the driver's t2 check: row count + sorted-by-name schema +
order-insensitive value comparison. Cells are canonicalized to strings
(shortest-repr for floats, isoformat for timestamps, recursive for
lists) so a multiset comparison is exact — the same property the
driver's value-hash requires.
"""

from __future__ import annotations

import datetime as _dt
import math
from collections import Counter

import numpy as np


def canon_cell(v) -> str:
    if v is None:
        return "\x00NULL"
    if isinstance(v, float | np.floating):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        if f == int(f) and abs(f) < 1e15:
            return str(int(f))  # 3.0 and 3 hash alike (int vs double cols)
        return repr(f)
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, bool | np.bool_):
        return str(bool(v))
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list | tuple | np.ndarray):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon_rows(columns: list[str], rows: list[tuple]) -> Counter:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return Counter(tuple(canon_cell(r[i]) for i in order) for r in rows)


def spark_result(df):
    # collect via rows (not toPandas) so None/NaT stay distinguishable
    rows = [tuple(r) for r in df.collect()]
    return [c.lower() for c in df.columns], rows


def duck_result(con, sql):
    cur = con.execute(sql)
    cols = [d[0].lower() for d in cur.description]
    return cols, cur.fetchall()


def assert_parity(df, con, sql, name=""):
    scols, srows = spark_result(df)
    dcols, drows = duck_result(con, sql)
    assert sorted(scols) == sorted(dcols), (
        f"{name}: column mismatch spark={sorted(scols)} duck={sorted(dcols)}"
    )
    assert len(srows) == len(drows), (
        f"{name}: row count spark={len(srows)} duck={len(drows)}"
    )
    sc, dc = canon_rows(scols, srows), canon_rows(dcols, drows)
    if sc != dc:
        only_s = list((sc - dc).items())[:5]
        only_d = list((dc - sc).items())[:5]
        raise AssertionError(
            f"{name}: value mismatch\n only in spark: {only_s}\n only in duck:  {only_d}"
        )
