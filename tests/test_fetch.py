"""S1 fetch utility: full path exercised with an injected transport —
no network. Covers URL construction, atomic write, idempotent skip,
partial-download cleanup."""

import io
import os

import pytest

from nyc_etl_pipeline_spark import fetch


class FakeResponse(io.BytesIO):
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def make_opener(payloads: dict[str, bytes], calls: list[str]):
    def opener(url):
        calls.append(url)
        if url not in payloads:
            raise OSError(f"unexpected url {url}")
        return FakeResponse(payloads[url])

    return opener


def test_urls_match_reference_layout():
    assert (
        fetch.trip_url("green", "2023-07")
        == "https://d37ci6vzurychx.cloudfront.net/trip-data/green_tripdata_2023-07.parquet"
    )
    assert fetch.zone_url().endswith("/misc/taxi_zone_lookup.csv")
    assert fetch.year_months(2023)[0] == "2023-01"
    assert fetch.year_months(2023)[-1] == "2023-12"
    assert len(fetch.year_months(2023)) == 12


def test_fetch_months_downloads_and_skips(tmp_path):
    months = ["2023-01", "2023-02"]
    payloads = {fetch.trip_url("green", m): f"data-{m}".encode() for m in months}
    calls: list[str] = []
    dest = str(tmp_path / "green")

    res = fetch.fetch_months("green", months, dest, opener=make_opener(payloads, calls))
    assert res == {"2023-01": True, "2023-02": True}
    assert len(calls) == 2
    for m in months:
        p = os.path.join(dest, f"{m}.parquet")
        with open(p, "rb") as f:
            assert f.read() == f"data-{m}".encode()
        assert not os.path.exists(p + ".part")

    # idempotent: second run fetches nothing
    res2 = fetch.fetch_months("green", months, dest, opener=make_opener(payloads, calls))
    assert res2 == {"2023-01": False, "2023-02": False}
    assert len(calls) == 2

    # overwrite forces a re-download
    res3 = fetch.fetch_months(
        "green", ["2023-01"], dest, opener=make_opener(payloads, calls), overwrite=True
    )
    assert res3 == {"2023-01": True}
    assert len(calls) == 3


def test_failed_download_leaves_no_artifacts(tmp_path):
    class ExplodingResponse:
        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

        def read(self, n):
            raise OSError("connection reset")

    dest = str(tmp_path / "f.parquet")
    with pytest.raises(OSError, match="connection reset"):
        fetch.fetch_file("http://x/f.parquet", dest, opener=lambda u: ExplodingResponse())
    assert not os.path.exists(dest)
    assert not os.path.exists(dest + ".part")


def test_fetch_zone_csv(tmp_path):
    calls: list[str] = []
    payloads = {fetch.zone_url(): b"LocationID,Borough\n1,EWR\n"}
    path = fetch.fetch_zone_csv(str(tmp_path), opener=make_opener(payloads, calls))
    assert path == str(tmp_path / "taxi_zone.csv")
    with open(path) as f:
        assert "EWR" in f.read()
