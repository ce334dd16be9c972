"""Paged REST/API ingestion — the reference's SODA fetch loop, redesigned
for scale (SURVEY.md §2.A "REST/API ingestion", design-level).

The reference looped ``$offset += $limit`` pulls, materializing every page
in client memory. That shape cannot scale past driver RAM, so the engine
splits it:

1. ``land_pages`` (driver or external ingester): walk the paged API, write
   each page VERBATIM as a JSON-lines file into a landing directory.
   Network I/O is bounded by the API; memory is bounded by one page.
2. ``read_landed``: bulk-read the landing dir with an explicit schema —
   executors parse JSON in parallel; this is where 100 TB enters Spark.
3. Optionally ``stream_landed``: tail the same directory incrementally
   (streaming/runtime.py pattern) while the ingester keeps appending.

HTTP runs on stdlib urllib and is exercised end-to-end (fetch → land →
bulk read) against a loopback SODA stub server in tests/test_ingest.py;
the paging logic also accepts any ``fetch_page(offset, limit) ->
list[dict]`` callable for in-memory fakes.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - container has no network stack guarantees
    import urllib.request as _urllib_request
except Exception:  # noqa: BLE001
    _urllib_request = None

PageFetcher = Callable[[int, int], list[dict]]


def soda_url(
    domain: str,
    dataset_id: str,
    limit: int,
    offset: int,
    base_url: str | None = None,
    **params: str,
) -> str:
    """SODA 2.x resource URL with paging params — the reference's query
    string 'IR' (``$select``/``$where``/... pass through as params).
    ``base_url`` overrides the ``https://{domain}`` origin (tests point it
    at a loopback stub server)."""
    from urllib.parse import quote

    query = {"$limit": str(limit), "$offset": str(offset), **params}
    qs = "&".join(f"{quote(k)}={quote(str(v))}" for k, v in query.items())
    origin = base_url if base_url is not None else f"https://{domain}"
    return f"{origin}/resource/{dataset_id}.json?{qs}"


def http_page_fetcher(
    domain: str,
    dataset_id: str,
    app_token: str | None = None,
    base_url: str | None = None,
    timeout: float = 30.0,
    **params,
) -> PageFetcher:
    """Real SODA pager over stdlib urllib. App token goes in the X-App-Token
    header exactly as the reference's YAML-configured client did. The full
    fetch→land→read path is exercised in tests against a local loopback HTTP
    stub (tests/test_ingest.py) — no external network needed."""

    def fetch(offset: int, limit: int) -> list[dict]:
        if _urllib_request is None:
            raise NotImplementedError("no HTTP stack available in this environment")
        req = _urllib_request.Request(
            soda_url(domain, dataset_id, limit, offset, base_url=base_url, **params)
        )
        if app_token:
            req.add_header("X-App-Token", app_token)
        with _urllib_request.urlopen(req, timeout=timeout) as resp:
            body = resp.read()
        page = json.loads(body)
        if not isinstance(page, list):
            raise ValueError(f"SODA page is not a JSON array (got {type(page).__name__})")
        return page

    return fetch


def with_retry(
    fetch_page: PageFetcher,
    max_attempts: int = 4,
    base_delay: float = 0.5,
    sleep=None,
    retryable: Callable[[Exception], bool] | None = None,
) -> PageFetcher:
    """Wrap a page fetcher with exponential-backoff retry — the missing
    half of every naive SODA paging loop (Socrata throttles with 429 and
    transient 5xx; a multi-hour backfill WILL hit both). Delays double per
    attempt (0.5, 1, 2 s ...); the final failure re-raises the original
    error. ``retryable`` filters which exceptions retry (default: HTTP
    429/5xx status codes and URLError-ish connection failures; ValueError
    and friends fail fast — a malformed page never fixes itself).
    ``sleep`` is injectable for tests."""
    import time as _time

    do_sleep = sleep if sleep is not None else _time.sleep

    def _default_retryable(exc: Exception) -> bool:
        code = getattr(exc, "code", None)  # urllib HTTPError
        if isinstance(code, int):
            return code == 429 or 500 <= code <= 599
        # OSError covers the whole transient-network family by subclassing:
        # URLError, TimeoutError, ConnectionError AND their subclasses
        # (ConnectionResetError, ConnectionRefusedError, socket.gaierror,
        # http.client.RemoteDisconnected, ...) — an exact-name match would
        # fail fast on exactly the errors a multi-hour backfill hits most
        return isinstance(exc, OSError)

    is_retryable = retryable if retryable is not None else _default_retryable

    def fetch(offset: int, limit: int) -> list[dict]:
        delay = base_delay
        for attempt in range(1, max_attempts + 1):
            try:
                return fetch_page(offset, limit)
            except Exception as exc:  # noqa: BLE001
                if attempt == max_attempts or not is_retryable(exc):
                    raise
                do_sleep(delay)
                delay *= 2
        raise AssertionError("unreachable")

    return fetch


def iter_pages(fetch_page: PageFetcher, page_size: int = 1000, max_rows: int | None = None) -> Iterator[list[dict]]:
    """The reference's core loop: pull pages until a short/empty page."""
    offset = 0
    while True:
        if max_rows is not None:
            remaining = max_rows - offset
            if remaining <= 0:
                return
            size = min(page_size, remaining)
        else:
            size = page_size
        page = fetch_page(offset, size)
        if not page:
            return
        yield page
        if len(page) < size:
            return
        offset += len(page)


def land_pages(
    fetch_page: PageFetcher,
    landing_dir: str,
    page_size: int = 1000,
    max_rows: int | None = None,
) -> int:
    """Walk the paged API, writing one JSON-lines file per page into the
    landing dir. Returns rows landed. Restartable: page files are atomic
    (tmp + rename) and numbered."""
    os.makedirs(landing_dir, exist_ok=True)
    n = 0
    for i, page in enumerate(iter_pages(fetch_page, page_size, max_rows)):
        tmp = os.path.join(landing_dir, f".page_{i:06d}.tmp")
        final = os.path.join(landing_dir, f"page_{i:06d}.jsonl")
        with open(tmp, "w") as fh:
            for row in page:
                fh.write(json.dumps(row, sort_keys=True))
                fh.write("\n")
        os.replace(tmp, final)
        n += len(page)
    return n


def read_landed(spark: SparkSession, landing_dir: str, schema: str) -> DataFrame:
    """Bulk-read the landing zone with an explicit schema (never infer in
    production — inference scans twice and drifts)."""
    return spark.read.schema(schema).json(landing_dir)
