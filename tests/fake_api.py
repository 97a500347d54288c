"""Deterministic fake REST transport for source tests — importable on
executors by module path (``tests.fake_api:make_transport``)."""

from __future__ import annotations

TOTAL_ROWS = 230  # 2 full pages + 1 short page at per_page=100


def _row(i: int, media_id: str | None = None) -> dict:
    return {
        "event_key": f"ev_{media_id or 'all'}_{i}",
        "media_id": media_id or f"m{i % 3}",
        "visitor_key": f"v{i % 7}",
        "percent_viewed": (i % 100) / 100.0,
    }


def make_transport():
    def fetch(endpoint: str, params: dict) -> list[dict]:
        page = int(params.get("page", 1))
        per_page = int(params.get("per_page", 100))
        media_id = params.get("media_id")
        if media_id == "m_broken":
            raise RuntimeError("simulated upstream failure")
        # media-sharded feeds are shorter: 0-149 rows depending on id
        total = TOTAL_ROWS if media_id is None else 50 * (int(media_id[1:]) + 1)
        start = (page - 1) * per_page
        stop = min(start + per_page, total)
        return [_row(i, media_id) for i in range(start, stop)]

    return fetch
