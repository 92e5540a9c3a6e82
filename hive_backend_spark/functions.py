"""Scalar function library (SURVEY §2.7 F1-F14): the reference's embedded
SQL/JS scalar logic as reusable column builders. All JVM-side built-ins —
no python in any of these paths."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MARKER = "\U0001F4CA"  # the reference's linked-shape marker (slides-code.gs:477)


def interval_ago(now: Column | str, n: int, unit: str = "MINUTES") -> Column:
    """F1 datetime('now', '-N minutes') with an injectable `now` so results
    are deterministic/oracle-matchable (SURVEY §7 hard part 4)."""
    now_col = F.lit(now).cast("timestamp") if isinstance(now, str) else now
    return now_col - F.expr(f"INTERVAL {n} {unit}")


def epoch_seconds(ts: Column) -> Column:
    """F2 strftime('%s', ts)."""
    return F.unix_timestamp(ts)


def null_safe_priority(priority: Column) -> Column:
    """F3 COALESCE(priority, 0) — the dequeue ordering key."""
    return F.coalesce(priority, F.lit(0))


def retry_counter(status: Column, retry_count: Column, error_value: str = "error") -> Column:
    """F4 CASE WHEN status='error' THEN retry_count+1 ELSE 0 END
    (db.mjs:313-316)."""
    return F.when(status == error_value, retry_count + 1).otherwise(F.lit(0))


def split_compound_key(cell_id: Column) -> tuple[Column, Column]:
    """F8 'SheetName!A1'.split('!') -> (sheet_name, range)."""
    parts = F.split(cell_id, "!", 2)
    return parts.getItem(0), parts.getItem(1)


def build_compound_key(sheet_name: Column, range_: Column) -> Column:
    """F9 `${sheetName}!${range}`."""
    return F.concat_ws("!", sheet_name, range_)


def has_marker(text: Column) -> Column:
    """F10 startsWith('📊') — linked-shape detection."""
    return F.startswith(text, F.lit(MARKER))


def strip_marker(text: Column) -> Column:
    """F10 substring(2) after the marker (+ the space the client appends).
    The marker is ONE character to Spark's character-addressed substring."""
    return F.when(has_marker(text), F.ltrim(F.substring(text, 2, 1 << 30))).otherwise(text)


def with_marker(text: Column) -> Column:
    """F10 marker prepend (idempotent)."""
    return F.when(has_marker(text), text).otherwise(F.concat(F.lit(MARKER + " "), text))


def deterministic_id(prefix: str, *key_cols: Column) -> Column:
    """F7 id synthesis, deterministic variant: the reference's
    `{prefix}-{epochMillis}-{rand36}` (server.mjs:72) replaced by
    input-derived digests so reruns and the oracle agree."""
    return F.concat_ws("-", F.lit(prefix), F.md5(F.concat_ws("\x1f", *key_cols)))


def backoff_schedule(min_ms: int = 1000, max_ms: int = 30000, mult: float = 1.5) -> list[int]:
    """F12/Q10 exponential poll backoff (sheets-code.gs:236-241): a
    driver-side control-loop concern, provided as plain python — it
    configures trigger cadence, it is not a data op."""
    out, cur = [], float(min_ms)
    while cur < max_ms:
        out.append(int(cur))
        cur *= mult
    out.append(max_ms)
    return out
