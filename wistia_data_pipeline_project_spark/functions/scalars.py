"""Named scalar-function API (SURVEY §2.9 F1-F12): the reference's
inline scalar behaviors as reusable Column functions.

Behavioral sources: ISO parse/format and +1 s arithmetic
(``/root/reference/process_wistia_data.py:80,339,413-416``), channel
inference (``process_wistia_data_v2.py:274-278``), run-id formats
(``ingest_wistia.py:318``), rounding/clamping/null-defaults
(``process_wistia_data_v2.py:441,469,475,497``). All are native
Column expressions — no Python UDFs (§2.11 design rule).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column
from pyspark.sql import functions as F

RUN_TS_FILE_RE = r"_(\d{8}_\d{6})\.json$"


def parse_iso_ts(col: Column | str) -> Column:
    """F1: ISO-8601 parse, `Z` or offset forms (UTC session tz)."""
    return F.to_timestamp(col)


def ts_to_date(col: Column | str) -> Column:
    """F2: timestamp → date."""
    return F.to_date(col)


def iso_format(col: Column | str) -> Column:
    """F3: second-precision ISO output with `Z` suffix."""
    return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss'Z'")


def hwm_buffer(col: Column | str, seconds: int = 1) -> Column:
    """F4: +N seconds via INTERVAL arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    return c + F.expr(f"INTERVAL {int(seconds)} SECOND")


def channel_of(title: Column | str) -> Column:
    """F5/P5: substring-based channel inference; NULL when unknown."""
    t = F.col(title) if isinstance(title, str) else title
    return (
        F.when(t.contains("Facebook") | t.contains("FB"), "Facebook")
        .when(t.contains("Youtube") | t.contains("YT"), "YouTube")
        .otherwise(F.lit(None).cast("string"))
    )


def run_ts_of_file() -> Column:
    """F6: run timestamp regex-extracted from the source file name."""
    return F.regexp_extract(F.input_file_name(), RUN_TS_FILE_RE, 1)


def clean_token(col: Column | str) -> Column:
    """F7: whitespace-stripped credential/token."""
    return F.trim(col)


def round2(col: Column | str) -> Column:
    """F8: round half-up to 2 decimals (play_rate precision)."""
    return F.round(col, 2)


def clamp_to(col: Column | str, cap: Column | str) -> Column:
    """F9/A8: min(x, cap) — the watch-time duration clamp."""
    return F.least(F.col(col) if isinstance(col, str) else col,
                   F.col(cap) if isinstance(cap, str) else cap)


def null_default(col: Column | str, default) -> Column:
    """F10: dict.get-style default."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(default))


def to_json_str(col: Column | str) -> Column:
    """F11: struct/map → JSON string."""
    return F.to_json(col)


def from_json_str(col: Column | str, schema: str) -> Column:
    """F11: JSON string → typed struct."""
    return F.from_json(col, schema)


def run_id(ts: dt.datetime) -> str:
    """F12: the reference's run-id format for staging file names."""
    return ts.strftime("%Y%m%d_%H%M%S")


def run_id_col(col: Column | str) -> Column:
    """F12 as a column (format a timestamp column as a run id)."""
    return F.date_format(col, "yyyyMMdd_HHmmss")
