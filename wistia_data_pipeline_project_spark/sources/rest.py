"""Paginated REST source (SURVEY §2.1 S1/S2/S4): the reference's
Wistia API ingest re-expressed with an injectable transport and a
Spark Python DataSource for partition-parallel fetch.

Reference behaviors reproduced (by observation, not by code reuse):
- page loop with early exit when a page is empty or short
  (``/root/reference/ingest_wistia.py:210-221``);
- server-side predicate pushdown: ``media_id`` / ``start_date`` /
  ``end_date`` / ``since`` travel as API params
  (``ingest_wistia.py:259-265``, ``process_wistia_data.py:462-471``);
- per-media failure isolation — one media's fetch error doesn't kill
  the run (``process_wistia_data.py:474-477``);
- run-timestamped JSON staging files
  (``ingest_wistia.py:330-337,352-359``).

Transport injection: every fetch goes through a ``Transport`` callable
``(endpoint, params) -> list[dict]``. Production binds an HTTP client;
tests bind a deterministic fake. The Spark DataSource receives the
transport as a ``module:function`` factory path because executor-side
code can only receive picklable options — a plain string survives the
trip and keeps the fake importable on workers.

Scale: the DataSource splits the page space into ``num_partitions``
page-range partitions fetched concurrently by executors — the driver
never holds the full result. Early exit still applies per partition
(a partition stops at its first short page). For unbounded feeds,
partition instead by key-range (media ids) × time-range, which is how
``partitions_for_medias`` shards event backfills.
"""

from __future__ import annotations

import importlib
import json
import logging
import os
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

log = logging.getLogger(__name__)

Transport = Callable[[str, dict], list[dict]]

DEFAULT_PER_PAGE = 100  # Wistia default page size (ingest_wistia.py:190)
UNBOUNDED_PAGE = 1 << 30  # page loop relies on the short-page stop


def http_transport(base_url: str, token: str, timeout: int = 60) -> Transport:
    """Production transport: one HTTPS GET per page. Deferred import so
    the engine never needs ``requests`` unless this is actually used."""

    def fetch(endpoint: str, params: dict) -> list[dict]:
        import requests  # type: ignore

        resp = requests.get(
            f"{base_url}/{endpoint}",
            params=params,
            headers={"Authorization": f"Bearer {token}"},
            timeout=timeout,
        )
        resp.raise_for_status()
        body = resp.json()
        return body if isinstance(body, list) else [body]

    return fetch


def paginate(
    transport: Transport,
    endpoint: str,
    params: dict | None = None,
    per_page: int = DEFAULT_PER_PAGE,
    start_page: int = 1,
    end_page: int | None = None,
) -> Iterator[dict]:
    """Page loop with early exit: stop on an empty or short page."""
    page = start_page
    while end_page is None or page <= end_page:
        rows = transport(endpoint, {**(params or {}), "page": page, "per_page": per_page})
        yield from rows
        if len(rows) < per_page:
            break
        page += 1


def fetch_medias(transport: Transport, **params) -> list[dict]:
    """S1: full media catalog."""
    return list(paginate(transport, "medias.json", params))


def fetch_media(transport: Transport, hashed_id: str) -> dict | None:
    """S4: single-item metadata fetch with the reference's 4-field
    projection (``ingest_wistia_v1.py:187-193`` — id, hashed_id,
    title←name, created_at←created). A dict response body arrives as
    a 1-element page (``http_transport`` wraps non-list bodies), so
    this is one ``paginate`` call bounded to one page; an empty
    response yields None, mirroring the reference's error return."""
    rows = list(
        paginate(transport, f"medias/{hashed_id}.json", end_page=1)
    )
    if not rows:
        return None
    m = rows[0]
    return {
        "id": m.get("id"),
        "hashed_id": m.get("hashed_id"),
        "title": m.get("name"),
        "created_at": m.get("created"),
    }


def fetch_events(
    transport: Transport,
    media_id: str | None = None,
    since: str | None = None,
    start_date: str | None = None,
    end_date: str | None = None,
) -> list[dict]:
    """S2: events with server-side predicates (source-level pushdown —
    the date/media params never materialize unfiltered data)."""
    params = {
        k: v
        for k, v in {
            "media_id": media_id,
            "since": since,
            "start_date": start_date,
            "end_date": end_date,
        }.items()
        if v is not None
    }
    return list(paginate(transport, "stats/events.json", params))


def fetch_events_per_media(
    transport: Transport, media_ids: list[str], **params
) -> tuple[list[dict], dict[str, str]]:
    """Per-media event fetch with failure isolation: one media's error
    is recorded, not raised (mirrors the reference's per-media
    try/except)."""
    rows: list[dict] = []
    errors: dict[str, str] = {}
    for mid in media_ids:
        try:
            rows.extend(fetch_events(transport, media_id=mid, **params))
        except Exception as exc:  # noqa: BLE001 — isolation is the point
            log.warning("event fetch failed for media %s: %s", mid, exc)
            errors[mid] = str(exc)
    return rows, errors


def stage_json(rows: list[dict], directory: str, name: str, run_ts: str) -> str:
    """K1: run-timestamped JSON-array staging file (readable back via
    ``read_wistia_events_json`` / ``latest_run_files``)."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"{name}_{run_ts}.json")
    with open(path, "w") as f:
        json.dump(rows, f, default=str)
    return path


# ---------------------------------------------------------------------------
# Spark Python DataSource: partition-parallel paginated fetch
# ---------------------------------------------------------------------------


def resolve_transport(spec: str) -> Transport:
    """``module:function`` → transport instance (executor-side)."""
    mod, _, fn = spec.partition(":")
    return getattr(importlib.import_module(mod), fn)()


@dataclass
class PageRange(InputPartition):
    start_page: int
    end_page: int
    extra_params: dict = field(default_factory=dict)


class RestReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.endpoint = options.get("endpoint", "medias.json")
        self.transport_spec = options["transport"]
        self.per_page = int(options.get("per_page", DEFAULT_PER_PAGE))
        self.num_partitions = int(options.get("num_partitions", 4))
        self.pages_per_partition = int(options.get("pages_per_partition", 25))
        self.params = json.loads(options.get("params", "{}"))
        self.media_ids = json.loads(options.get("media_ids", "null"))

    def partitions(self) -> list[PageRange]:
        if self.media_ids:
            # key-sharded: one partition per media id, unbounded pages
            return [
                PageRange(1, UNBOUNDED_PAGE, {"media_id": m}) for m in self.media_ids
            ]
        # The LAST partition is unbounded: a feed longer than the
        # planned num_partitions*pages_per_partition page space must
        # not be silently truncated — the tail partition keeps
        # paginating until the short-page stop condition. (Cost model:
        # overflow serializes into one task; raise num_partitions /
        # pages_per_partition when a feed routinely overflows.)
        return [
            PageRange(
                i * self.pages_per_partition + 1,
                (i + 1) * self.pages_per_partition
                if i < self.num_partitions - 1
                else UNBOUNDED_PAGE,
            )
            for i in range(self.num_partitions)
        ]

    def read(self, partition: PageRange) -> Iterator[tuple]:
        transport = resolve_transport(self.transport_spec)
        names = [f.name for f in self.schema_.fields]
        for row in paginate(
            transport,
            self.endpoint,
            {**self.params, **partition.extra_params},
            per_page=self.per_page,
            start_page=partition.start_page,
            end_page=partition.end_page,
        ):
            yield tuple(row.get(n) for n in names)


class RestDataSource(DataSource):
    """``spark.read.format("paginated_rest")`` — executors fetch page
    ranges (or media shards) in parallel; the driver only plans.

    Required options: ``transport`` (``module:function`` factory
    path), ``endpoint``. A schema must be provided by the caller (the
    API has no schema endpoint; the engine declares its shapes in
    ``schemas.py``)."""

    @classmethod
    def name(cls) -> str:
        return "paginated_rest"

    def schema(self):
        raise NotImplementedError("pass an explicit schema via .schema(...)")

    def reader(self, schema: StructType) -> RestReader:
        return RestReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(RestDataSource)
