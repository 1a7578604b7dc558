"""Remote file fetch for manifest sources (SURVEY §2.1 remote abstraction).

The reference reads manifest workbooks from local paths, ``http(s)://``
URLs and Google Sheets alike (lib/id3c/cli/io/__init__.py:9-54 urlopen via
fsspec; lib/id3c/cli/io/google.py:37-92 exports a Sheet as xlsx). Spark's
native readers already handle s3a/hdfs/file URIs for distributed scans;
this module covers the driver-side single-workbook case:

  - ``fetch_local(path_or_url)`` — context manager yielding a local
    filesystem path: local paths pass through; http(s) URLs download to a
    temp file (stdlib urllib, no extra deps); Google Sheets URLs are
    rewritten to the public xlsx-export endpoint first.
  - ``extract_document_id_from_google_url`` — document-id parsing parity
    with google.py:64-84.

The HTTP opener is injectable so tests run offline against a stub server
and ETL callers can plug authenticated transports.

Scale: a manifest workbook is ONE small file consumed on the driver —
downloading it locally is the same data movement the reference performs.
Bulk binary corpora instead go through ``spark.read.format("binaryFile")``
and stay distributed (see multimodal.py).
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile
import urllib.error
import urllib.request
from collections.abc import Callable, Iterator
from contextlib import contextmanager
from urllib.parse import urlparse

Opener = Callable[[str], object]

_GOOGLE_DOCS_PATTERN = re.compile(r"^/[^/]+/d/(?P<document_id>[a-zA-Z0-9-_]+)", re.IGNORECASE)


def extract_document_id_from_google_url(url_str: str) -> str | None:
    """Document id from a docs.google.com URL, else None (google.py:64-84).

    >>> extract_document_id_from_google_url(
    ...     'https://docs.google.com/spreadsheets/d/1BxiMVs0XRA5nFMdK/edit#gid=0')
    '1BxiMVs0XRA5nFMdK'
    >>> extract_document_id_from_google_url('s3://bucket/file.xlsx') is None
    True
    """
    url = urlparse(url_str)
    if url.hostname != "docs.google.com":
        return None
    m = _GOOGLE_DOCS_PATTERN.match(url.path)
    return m["document_id"] if m else None


def sheets_export_url(document_id: str, fmt: str = "xlsx") -> str:
    """The public Sheets export endpoint — the no-credential counterpart of
    the reference's Drive files().export_media (google.py:37-62), producing
    the same xlsx bytes for link-shared sheets."""
    return f"https://docs.google.com/spreadsheets/d/{document_id}/export?format={fmt}"


def resolve_url(path_or_url: str) -> str:
    """Rewrite Google Docs URLs to their xlsx export form; pass everything
    else through untouched."""
    doc_id = extract_document_id_from_google_url(path_or_url)
    if doc_id:
        return sheets_export_url(doc_id)
    return path_or_url


@contextmanager
def fetch_local(
    path_or_url: str,
    opener: Opener | None = None,
    google_token: str | None = None,
    google_token_provider=None,
    google_transport=None,
) -> Iterator[str]:
    """Yield a local filesystem path for *path_or_url*.

    Local paths (and file:// URIs) yield as-is; http(s) URLs (including
    Google Sheets links, rewritten to their export endpoint) download to a
    NamedTemporaryFile that is removed on exit. Unknown remote schemes
    raise — distributed schemes (s3a, hdfs) belong to Spark's readers, not
    this driver-side path.

    Google Docs URLs: with credentials available (an explicit token /
    provider / transport argument, or GOOGLE_OAUTH_ACCESS_TOKEN in the
    environment) the workbook is exported through the authenticated Drive
    API (sources/google_drive.py — private sheets, the reference's
    io/google.py flow); otherwise through the public link-share export
    endpoint. When the credentials came only from the ENVIRONMENT (no
    explicit argument) and the authenticated export is denied with
    401/403 — a stale or expired ambient token — the fetch falls back to
    the public link-share export instead of failing a workbook that is
    publicly shared. Explicitly passed credentials never fall back: the
    caller asked for the private path, so the denial is the answer.
    """
    doc_id = extract_document_id_from_google_url(path_or_url)
    explicit_creds = bool(google_token or google_token_provider or google_transport)
    if doc_id and (explicit_creds or os.environ.get("GOOGLE_OAUTH_ACCESS_TOKEN")):
        from id3c_spark.sources.google_drive import (
            GoogleDriveExportFormat,
            export_file_from_google_drive,
        )

        try:
            buf = export_file_from_google_drive(
                doc_id,
                GoogleDriveExportFormat.EXCEL,
                token=google_token,
                token_provider=google_token_provider,
                transport=google_transport,
            )
        except urllib.error.HTTPError as err:
            if explicit_creds or err.code not in (401, 403):
                raise
            buf = None  # ambient token rejected — try the public export
        if buf is not None:
            with tempfile.NamedTemporaryFile(suffix=".xlsx") as tmp:
                shutil.copyfileobj(buf, tmp)
                tmp.flush()
                yield tmp.name
            return
    url = resolve_url(path_or_url)
    scheme = urlparse(url).scheme if "://" in url else ""
    if scheme in ("", "file"):
        yield url[len("file://"):] if scheme == "file" else url
        return
    if scheme not in ("http", "https"):
        raise ValueError(
            f"unsupported scheme {scheme!r} for driver-side fetch: {path_or_url}"
            " (use spark.read for s3a/hdfs paths)"
        )
    do_open = opener or urllib.request.urlopen
    with tempfile.NamedTemporaryFile(suffix=_suffix_of(url)) as tmp:
        with do_open(url) as resp:  # type: ignore[operator]
            shutil.copyfileobj(resp, tmp)
        tmp.flush()
        yield tmp.name


def _suffix_of(url: str) -> str:
    path = urlparse(url).path
    if "." in path.rsplit("/", 1)[-1]:
        return "." + path.rsplit(".", 1)[-1]
    if "format=xlsx" in url:
        return ".xlsx"
    return ""
