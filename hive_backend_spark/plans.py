"""Physical-plan introspection (SURVEY §4): the engine relies on Catalyst
for pushdown/pruning/join-selection rather than custom rules, so the
guarantee we CAN make is that the optimizer actually produced the plan we
designed for. These helpers extract the physical operator list, pushed
filters, and codegen spans from `explain("formatted")` output; the plan
tests assert the load-bearing properties (broadcast joins stay broadcast,
top-k stays TakeOrderedAndProject, scans keep their PushedFilters)."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame

_OP_RE = re.compile(r"^\s*\(\d+\)\s+(\S+)")
_PUSHED_RE = re.compile(r"PushedFilters: \[([^\]]*)\]")
_READSCHEMA_RE = re.compile(r"ReadSchema: (\S+)")


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def physical_ops(df: DataFrame) -> list[str]:
    """Physical operator names in plan order, e.g. ['Scan', 'Filter',
    'BroadcastHashJoin', ...]."""
    ops = []
    for line in formatted_plan(df).splitlines():
        m = _OP_RE.match(line)
        if m:
            ops.append(m.group(1))
    return ops


def pushed_filters(df: DataFrame) -> list[str]:
    """Every scan's PushedFilters content (one string per scan)."""
    return _PUSHED_RE.findall(formatted_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    """Every scan's ReadSchema — the column-pruning evidence."""
    return _READSCHEMA_RE.findall(formatted_plan(df))


def assert_plan(df: DataFrame, requires: list[str] = (), forbids: list[str] = ()) -> None:
    """Assert operator presence/absence by name substring."""
    ops = physical_ops(df)
    for op in requires:
        assert any(op in o for o in ops), f"plan missing {op!r}: {ops}"
    for op in forbids:
        assert not any(op in o for o in ops), f"plan contains forbidden {op!r}: {ops}"
