"""Paged ingestion: the fetch loop, atomic landing, schema'd bulk read."""

from hawaiidatapipeline_spark.sources.ingest import iter_pages, land_pages, read_landed, soda_url


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
    assert "$limit=1000" in url and "$offset=2000" in url and "$where=x > 1" in url
