"""Authenticated Google Drive/Sheets export (SURVEY §2.1 remote sources).

Mirrors the reference's credentialed Drive client
(lib/id3c/cli/io/google.py:37-92): the same export-format → MIME map, the
same files().export_media semantics (chunked download into a BytesIO) and
get_document_etag — but over the public Drive REST endpoints with stdlib
urllib instead of googleapiclient, so no extra dependencies.

Credential acquisition is INJECTABLE: the Drive REST path (request shape,
auth header, chunking, error mapping) is real and offline-testable, while
the access token comes from, in order:

  1. an explicit ``token`` argument / ``token_provider`` callable,
  2. the ``GOOGLE_OAUTH_ACCESS_TOKEN`` environment variable,
  3. otherwise a clear error naming the hook.

A production deployment injects a provider that exchanges its
service-account key for a token (the reference's
GOOGLE_APPLICATION_CREDENTIALS flow); tests inject a stub transport.
"""

from __future__ import annotations

import io
import json
import os
import urllib.parse
import urllib.request
from collections.abc import Callable
from enum import Enum

DRIVE_API = "https://www.googleapis.com/drive/v3/files"

# Public Drive export formats (developers.google.com/drive/api/guides/ref-export-formats)
class GoogleDriveExportFormat(Enum):
    CSV = "CSV"
    EXCEL = "Excel"
    HTML = "HTML"
    HTML_ZIPPED = "HTML zipped"
    PDF = "PDF"
    PLAIN_TEXT = "Plain text"
    RICH_TEXT = "Rich text"
    WORD = "Word"


GOOGLE_FORMAT_MIME_MAP = {
    GoogleDriveExportFormat.CSV: "text/csv",
    GoogleDriveExportFormat.EXCEL:
        "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    GoogleDriveExportFormat.HTML: "text/html",
    GoogleDriveExportFormat.HTML_ZIPPED: "application/zip",
    GoogleDriveExportFormat.PDF: "application/pdf",
    GoogleDriveExportFormat.PLAIN_TEXT: "text/plain",
    GoogleDriveExportFormat.RICH_TEXT: "application/rtf",
    GoogleDriveExportFormat.WORD:
        "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
}

TokenProvider = Callable[[], str]
Transport = Callable[[urllib.request.Request], object]


def resolve_token(
    token: str | None = None, token_provider: TokenProvider | None = None
) -> str:
    if token:
        return token
    if token_provider:
        return token_provider()
    env = os.environ.get("GOOGLE_OAUTH_ACCESS_TOKEN")
    if env:
        return env
    raise RuntimeError(
        "no Google credentials: pass token=/token_provider=, or set "
        "GOOGLE_OAUTH_ACCESS_TOKEN (e.g. from your service-account flow)"
    )


def _request(
    url: str,
    token: str,
    transport: Transport | None,
    headers: dict[str, str] | None = None,
):
    req = urllib.request.Request(
        url, headers={"Authorization": f"Bearer {token}", **(headers or {})}
    )
    do = transport or urllib.request.urlopen
    return do(req)


def export_file_from_google_drive(
    document_id: str,
    destination_format: GoogleDriveExportFormat,
    token: str | None = None,
    token_provider: TokenProvider | None = None,
    transport: Transport | None = None,
    chunk_size: int = 1 << 20,
) -> io.BytesIO:
    """Export a Drive document in the requested format — files().export
    parity (reference google.py:37-62) including the multi-chunk read loop
    (MediaIoBaseDownload.next_chunk) and the multi-sheet-to-CSV caveat
    (the first sheet wins). Returns a rewound BytesIO."""
    mime = GOOGLE_FORMAT_MIME_MAP[destination_format]
    url = f"{DRIVE_API}/{document_id}/export?mimeType={urllib.parse.quote(mime, safe='')}"
    tok = resolve_token(token, token_provider)
    buffer = io.BytesIO()
    with _request(url, tok, transport) as resp:
        while True:
            chunk = resp.read(chunk_size)
            if not chunk:
                break
            buffer.write(chunk)
    buffer.seek(0)
    return buffer


def get_document_etag(
    document_id: str,
    token: str | None = None,
    token_provider: TokenProvider | None = None,
    transport: Transport | None = None,
) -> str:
    """Drive metadata etag — change detection for cached workbook pulls
    (reference google.py:86-92). Drive v3 dropped the v2 etag field, so the
    modifiedTime+md5Checksum pair (or v3's etag when present) serves the
    same freshness contract."""
    url = f"{DRIVE_API}/{document_id}?fields=etag,modifiedTime,md5Checksum&supportsAllDrives=true"
    tok = resolve_token(token, token_provider)
    with _request(url, tok, transport) as resp:
        meta = json.loads(resp.read().decode("utf-8"))
    return meta.get("etag") or f"{meta.get('modifiedTime')}/{meta.get('md5Checksum')}"
