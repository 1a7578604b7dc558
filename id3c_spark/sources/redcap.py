"""REDCap web-API client (reference: lib/id3c/cli/redcap.py).

A real HTTP implementation of the adapter that etl/redcap_det.py consumes,
with the reference's exact request/paging contract:

  - every call is a POST of form-encoded parameters carrying ``token``,
    ``content`` and ``format`` (redcap.py:538-563);
  - project metadata is fetched at construction and the token's project id
    is asserted against the requested one (redcap.py:52-71);
  - ``records()`` mirrors the parameter mapping of redcap.py:235-325
    (type=flat, rawOrLabel, exportCheckboxLabel, exportSurveyFields,
    dateRangeBegin/End, records/forms/fields/events joins, filterLogic);
  - paged fetching (redcap.py:330-356) asks ``generateNextRecordName`` for
    the exclusive upper bound, then pages by ``[record_id_field] >= lower
    and < upper`` filter logic, the last page unbounded above so records
    created mid-pagination are still caught;
  - ``logs()`` maps log_type/since/until/record/user/dag →
    logtype/beginTime/endTime/record/user/dag (redcap.py:141-212);
  - ``update_records()`` posts overwrite-behavior data and verifies the
    reported count, honoring dry_run (redcap.py:364-416).

Transport is injectable (any ``callable(url, data: bytes, headers) ->
bytes``) so tests run against a stub server and deployments can add auth /
proxies; the default is stdlib ``urllib.request`` — no external deps.

Scale: the REDCap API is an external row-limited service — the client is
driver-side by design. Distribution happens AFTER ingest: fetched batches
become a DataFrame immediately (etl/redcap_det.py) and everything
downstream is a distributed plan.
"""

from __future__ import annotations

import json
import re
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Callable, Iterator, Sequence
from typing import Any

Transport = Callable[[str, bytes, dict], bytes]

DEFAULT_BATCH_SIZE = 5000  # redcap_det.py:88-93 fetch batch contract


def _default_transport(url: str, data: bytes, headers: dict) -> bytes:
    req = urllib.request.Request(url, data=data, headers=headers, method="POST")
    with urllib.request.urlopen(req) as resp:
        return resp.read()


def url_endpoints(url: str) -> tuple[str, str]:
    """(api_url, base_url) from either form (redcap.py Url handling):
    a ``.../api/`` URL is used as-is, otherwise ``/api/`` is appended."""
    base = url.rstrip("/")
    if base.endswith("/api"):
        return base + "/", base[: -len("/api")] + "/"
    return base + "/api/", base + "/"


class RedcapProject:
    """Interact with one REDCap project via its web API (redcap.py:21-71)."""

    def __init__(
        self,
        url: str,
        project_id: int,
        *,
        token: str,
        dry_run: bool = False,
        transport: Transport | None = None,
        batch_size: int = DEFAULT_BATCH_SIZE,
    ) -> None:
        self.api_url, self.base_url = url_endpoints(url)
        self.api_token = token
        self.dry_run = bool(dry_run)
        self.id = int(project_id)
        self.batch_size = batch_size
        self.calls = 0
        self._transport = transport or _default_transport
        self._instruments: list[str] | None = None
        self._events: list[str] | None = None
        self._fields: list[dict] | None = None
        self._redcap_version: str | None = None

        # token-vs-project safety check (redcap.py:67-71)
        self._details = self._fetch("project")
        actual = int(self._details["project_id"])
        assert self.id == actual, (
            f"REDCap API token provided for project {self.id} is actually "
            f"for project {actual} ({self._details.get('project_title')!r})!"
        )

    # --- metadata properties (redcap.py:73-128) ---------------------------

    @property
    def title(self) -> str:
        return self._details["project_title"]

    @property
    def instruments(self) -> list[str]:
        if self._instruments is None:
            self._instruments = [r["instrument_name"] for r in self._fetch("instrument")]
        return self._instruments

    @property
    def events(self) -> list[str]:
        if self._events is None:
            if self._details.get("is_longitudinal"):
                self._events = [r["unique_event_name"] for r in self._fetch("event")]
            else:
                self._events = []
        return self._events

    @property
    def fields(self) -> list[dict]:
        if self._fields is None:
            self._fields = self._fetch("metadata")
        return self._fields

    @property
    def record_id_field(self) -> str:
        """Always the first field in a project (redcap.py:117-128)."""
        return self.fields[0]["field_name"]

    @property
    def redcap_version(self) -> str:
        if self._redcap_version is None:
            self._redcap_version = self._fetch("version", format="text")
        return self._redcap_version

    # --- records (redcap.py:235-361) --------------------------------------

    def records(
        self,
        *,
        since_date: str | None = None,
        until_date: str | None = None,
        ids: Sequence[str] | None = None,
        instruments: Sequence[str] | None = None,
        fields: Sequence[str] | None = None,
        events: Sequence[str] | None = None,
        filter: str | None = None,
        raw: bool = False,
        page_size: int | None = None,
    ) -> list[dict] | Iterator[dict]:
        parameters: dict[str, str] = {
            "type": "flat",
            "rawOrLabel": "raw" if raw else "label",
            "exportCheckboxLabel": "true",
            "exportSurveyFields": "true",
        }
        assert not ((since_date or until_date) and ids), (
            "The REDCap API does not support fetching records filtered by id *and* date."
        )
        if since_date:
            parameters["dateRangeBegin"] = since_date
        if until_date:
            parameters["dateRangeEnd"] = until_date
        if ids is not None:
            parameters["records"] = ",".join(map(str, ids))
        if instruments is not None:
            parameters["forms"] = ",".join(map(str, instruments))
        if fields is not None:
            parameters["fields"] = ",".join(map(str, fields))
        if events is not None:
            parameters["events"] = ",".join(map(str, events))
        if filter is not None:
            parameters["filterLogic"] = str(filter)

        if page_size is not None:
            return self._fetch_records_paged(parameters, page_size)
        return self._fetch("record", parameters)

    def _fetch_records_paged(self, parameters: dict, page_size: int) -> Iterator[dict]:
        """Page by record id with an unbounded final page (redcap.py:330-356)."""
        assert bool(self._details.get("record_autonumbering_enabled")), (
            "Record auto-numbering must be enabled to use page_size parameter"
        )
        next_record_id = int(self._fetch("generateNextRecordName"))
        pages = [
            (lower, lower + page_size if lower + page_size < next_record_id else None)
            for lower in range(1, next_record_id, page_size)
        ]
        for lower, upper in pages:
            page_filter = f"[{self.record_id_field}] >= {lower}"
            if upper is not None:
                page_filter += f" and [{self.record_id_field}] < {upper}"
            page_parameters = parameters.copy()
            existing = page_parameters.get("filterLogic")
            page_parameters["filterLogic"] = (
                f"({page_filter}) and ({existing})" if existing else page_filter
            )
            yield from self._fetch("record", page_parameters)

    # --- logs (redcap.py:141-212) ------------------------------------------

    def logs(
        self,
        *,
        log_type: str | None = None,
        since_date: str | None = None,
        until_date: str | None = None,
        record: str | None = None,
        user: str | None = None,
        dag: str | None = None,
        return_format: str = "json",
    ) -> list[dict]:
        parameters: dict[str, str] = {"returnFormat": return_format}
        if since_date:
            parameters["beginTime"] = since_date
        if until_date:
            parameters["endTime"] = until_date
        if log_type:
            parameters["logtype"] = log_type
        if record:
            parameters["record"] = record
        if user:
            parameters["user"] = user
        if dag:
            parameters["dag"] = dag
        return self._fetch("log", parameters)

    # --- writes (redcap.py:364-416) -----------------------------------------

    def update_records(
        self, records: list[dict], date_format: str = "YMD", check_count: bool = True
    ) -> int:
        assert date_format in {"YMD", "DMY", "MDY"}
        parameters = {
            "data": json.dumps(records, allow_nan=False),
            "type": "flat",
            "overwriteBehavior": "overwrite",
            "forceAutoNumber": "false",
            "dateFormat": date_format,
            "returnContent": "count",
        }
        expected = len(records)
        if self.dry_run:
            return expected
        result = self._fetch("record", parameters)
        updated = int(result["count"])
        if check_count:
            assert expected == updated, (
                f"Expected vs. actual records updated do not match: {expected:,} != {updated:,}"
            )
        return updated

    # --- etl/redcap_det adapter contract ------------------------------------

    def fetch(self, record_ids: Sequence[str]) -> list[dict]:
        """Batched id fetch — the FakeRedcapApi-compatible surface consumed
        by etl/redcap_det.run (batches of *batch_size*, redcap_det.py:88-93)."""
        out: list[dict] = []
        for i in range(0, len(record_ids), self.batch_size):
            out.extend(self.records(ids=record_ids[i : i + self.batch_size], raw=True))
        return out

    # --- transport (redcap.py:538-596) ---------------------------------------

    def _fetch(self, content: str, parameters: dict | None = None, *, format: str = "json") -> Any:
        headers = {
            "Content-type": "application/x-www-form-urlencoded",
            "Accept": "application/json" if format == "json" else "text/*",
        }
        data = {
            **(parameters or {}),
            "content": content,
            "token": self.api_token,
            "format": format,
        }
        body = urllib.parse.urlencode(data).encode()
        self.calls += 1
        raw = self._transport(self.api_url, body, headers)
        text = raw.decode() if isinstance(raw, bytes) else raw
        if format != "json":
            return text.strip()
        return json.loads(text)

    def __repr__(self) -> str:
        return f"<RedcapProject {self.id} @ {self.base_url}>"


# --- DET generation (redcap.py:680-901, cli/command/redcap_det.py:33-128) ---

COMPLETE_VALUES = {"Complete", 2, "2"}  # InstrumentStatus.Complete (redcap.py:683-690)


def completion_status_field(instrument: str) -> str:
    """REDCap's automatic completion-status field name (redcap.py:725-744)."""
    return f"{instrument}_complete"


def is_complete(instrument: str, data: dict) -> bool | None:
    """Completion test over a record or DET (redcap.py:693-722):
    None when the field is absent."""
    value = data.get(completion_status_field(instrument))
    if value is None:
        return None
    return value in COMPLETE_VALUES


def det(project: RedcapProject, record: dict, instrument: str,
        generated_by: str = "id3c-spark redcap-det generate") -> dict:
    """A 'fake' DET notification mimicking REDCap's own shape
    (redcap.py:855-901)."""
    complete_field = completion_status_field(instrument)
    det_record = {
        "redcap_url": project.base_url,
        "project_id": str(project.id),                  # DETs send these as strings
        "record": str(record[project.record_id_field]),
        "instrument": instrument,
        complete_field: record[complete_field],
        "redcap_repeat_instance": record.get("redcap_repeat_instance"),
        "redcap_repeat_instrument": record.get("redcap_repeat_instrument"),
        "__generated_by__": generated_by,
    }
    if "redcap_event_name" in record:
        det_record["redcap_event_name"] = record["redcap_event_name"]
    return det_record


def generate_dets(
    project: RedcapProject,
    record_ids: Sequence[str] = (),
    *,
    since_date: str | None = None,
    until_date: str | None = None,
    instruments: Sequence[str] | None = None,
    events: Sequence[str] | None = None,
    include_incomplete: bool = False,
) -> Iterator[dict]:
    """DET notifications for project records
    (cli/command/redcap_det.py:61-128): complete instruments only unless
    include_incomplete; instrument/event names validated against the
    project's metadata."""
    if (since_date or until_date) and record_ids:
        raise ValueError(
            "The REDCap API does not support fetching records filtered by id *and* date."
        )

    def check_known(values, known, option):
        if values:
            if not known:
                raise ValueError(f"There are no --{option} values in the REDCap project.")
            unknown = set(values) - set(known)
            assert not unknown, (
                f"The following --{option} names aren't in the REDCap project: {unknown}"
            )
            return list(values)
        return list(known)

    events = check_known(events, project.events, "event")
    instruments = check_known(instruments, project.instruments, "instrument")

    fields = [project.record_id_field, *map(completion_status_field, instruments)]
    records = project.records(
        since_date=since_date,
        until_date=until_date,
        ids=list(record_ids) or None,
        fields=fields,
        events=events or None,
        raw=True,
    )
    for record in records:
        for instrument in instruments:
            if include_incomplete or is_complete(instrument, record):
                yield det(project, record, instrument)
