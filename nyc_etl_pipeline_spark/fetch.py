"""Raw-file fetch (SURVEY §2.1 S1): download TLC monthly parquet and the
zone-lookup CSV to a local directory, ready for `Engine.run_silver`.

Reference behavior (raw.py:18-25, 51-58, 77-84): `requests.get` the
CloudFront URL, buffer the whole response in memory, write it over the
destination file. Differences here, each a durability/scale fix:

- STREAMED to disk in chunks — a yellow month is ~50 MB today; buffering
  whole responses caps fetch parallelism by RAM for no benefit.
- ATOMIC: written to `<name>.part` then `os.replace`d into place — the
  reference truncates the destination before writing, so a crash
  mid-download leaves a corrupt parquet that poisons the next silver run.
- IDEMPOTENT: an existing non-empty destination is skipped (pass
  `overwrite=True` to force), so a re-run after a partial batch only
  fetches what's missing — the same retry-safety contract as the
  warehouse writers.
- Transport is injectable (`opener`) so tests exercise the full path
  without network; the default is stdlib urllib — no third-party HTTP
  dependency.

This stays OUT of the engine proper: fetching is a driver-side utility
that stages files for the distributed pipeline, not a Spark job. (At
real scale you would fetch straight into object storage with a transfer
tool and point `run_silver` at the bucket; this mirrors the reference's
single-node staging layout.)
"""

from __future__ import annotations

import os
import urllib.request
from typing import Callable

TLC_BASE = "https://d37ci6vzurychx.cloudfront.net"

#: months "YYYY-MM" for one year — the reference's MonthlyPartitionsDefinition
def year_months(year: int) -> list[str]:
    return [f"{year}-{m:02d}" for m in range(1, 13)]


def trip_url(color: str, month: str) -> str:
    """URL of one monthly trip file (reference raw.py:19, 52)."""
    return f"{TLC_BASE}/trip-data/{color}_tripdata_{month}.parquet"


def zone_url() -> str:
    """URL of the taxi-zone lookup CSV (reference raw.py:78)."""
    return f"{TLC_BASE}/misc/taxi_zone_lookup.csv"


def fetch_file(
    url: str,
    dest: str,
    opener: Callable | None = None,
    overwrite: bool = False,
    chunk_bytes: int = 1 << 20,
) -> bool:
    """Download `url` to `dest` (atomic, streamed). Returns True if a
    download happened, False if skipped as already present."""
    if not overwrite and os.path.exists(dest) and os.path.getsize(dest) > 0:
        return False
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    opener = opener or urllib.request.urlopen
    part = dest + ".part"
    try:
        with opener(url) as resp, open(part, "wb") as out:
            while True:
                chunk = resp.read(chunk_bytes)
                if not chunk:
                    break
                out.write(chunk)
        os.replace(part, dest)
    finally:
        if os.path.exists(part):
            os.remove(part)
    return True


def fetch_months(
    color: str,
    months: list[str],
    dest_dir: str,
    opener: Callable | None = None,
    overwrite: bool = False,
) -> dict[str, bool]:
    """Fetch a set of monthly trip files into `dest_dir` using the
    engine's expected layout (`YYYY-MM.parquet`, matching the
    reference's data/green_data naming). Returns {month: downloaded?}.
    """
    results: dict[str, bool] = {}
    for month in months:
        dest = os.path.join(dest_dir, f"{month}.parquet")
        results[month] = fetch_file(
            trip_url(color, month), dest, opener=opener, overwrite=overwrite
        )
    return results


def fetch_zone_csv(
    dest_dir: str, opener: Callable | None = None, overwrite: bool = False
) -> str:
    """Fetch the taxi-zone lookup CSV; returns its local path."""
    dest = os.path.join(dest_dir, "taxi_zone.csv")
    fetch_file(zone_url(), dest, opener=opener, overwrite=overwrite)
    return dest
