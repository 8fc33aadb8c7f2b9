"""Driver-side HTTP utilities (SURVEY §2.1 S7/S8): URL existence probing
and staged downloads. These are orchestration helpers, not Spark
operators — exactly as in the reference (dags/mitma/fetch_url_mitma.py,
dags/*/fetch_url_*.py)."""

from __future__ import annotations

import datetime
import os
import urllib.request
import zipfile
from concurrent.futures import ThreadPoolExecutor

try:
    import requests

    _HAS_REQUESTS = True
except ImportError:  # pragma: no cover
    _HAS_REQUESTS = False


def mitma_daily_urls(start: datetime.date, end: datetime.date, template: str) -> list[str]:
    """Candidate daily-file URL generation
    (dags/mitma/fetch_url_mitma.py:42-47): one URL per date in range."""
    out = []
    d = start
    while d <= end:
        out.append(template.format(yyyymm=d.strftime("%Y%m"), yyyymmdd=d.strftime("%Y%m%d")))
        d += datetime.timedelta(days=1)
    return out


def probe_urls(urls: list[str], max_workers: int = 10, timeout: float = 5.0) -> list[str]:
    """HEAD-probe fan-out (dags/mitma/fetch_url_mitma.py:5-10,52-59):
    returns the subset of URLs that exist."""
    if not _HAS_REQUESTS:
        raise RuntimeError("requests not available for URL probing")

    def head_ok(url: str) -> str | None:
        try:
            r = requests.head(url, timeout=timeout, allow_redirects=True)
            return url if r.status_code == 200 else None
        except requests.RequestException:
            return None

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        return [u for u in pool.map(head_ok, urls) if u is not None]


def download_cached(url: str, dest_dir: str, filename: str | None = None) -> str:
    """Skip-if-exists download (dags/geometry/fetch_url_geometry.py:12-21)."""
    os.makedirs(dest_dir, exist_ok=True)
    filename = filename or url.rsplit("/", 1)[-1]
    dest = os.path.join(dest_dir, filename)
    if not os.path.exists(dest):
        urllib.request.urlretrieve(url, dest)  # noqa: S310
    return dest


def unzip_cached(zip_path: str, dest_dir: str) -> str:
    """Unzip helper (dags/geometry/fetch_url_geometry.py:17-21)."""
    os.makedirs(dest_dir, exist_ok=True)
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(dest_dir)
    return dest_dir
