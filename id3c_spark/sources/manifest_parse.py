"""Manifest workbook parsing (reference: lib/id3c/cli/command/manifest.py).

The reference's ``manifest parse`` turns one Excel/Sheets workbook into
NDJSON records for ``receiving upload``: glob-matched column mapping, an
optional row filter, barcode QC (drop-missing + drop-duplicated), a
``sample_type`` tag and per-row ``_provenance`` (workbook, sha1, sheet,
row). A manifest workbook is ONE small file, so this stage runs driver-
side — the same locality as the reference's pandas read — and its output
feeds the distributed receiving/ETL path. The pandas row filter uses
``DataFrame.query`` for exact reference filter-string compatibility
(manifest.py:341-343).

Citations: _parse manifest.py:278-395; select_column(s) 471-511;
perform_qc/drop_missing_barcodes/deduplicate_barcodes 513-612;
provenance key 36-42, row numbering 383-389.
"""

from __future__ import annotations

import fnmatch
import hashlib
import json
import re
from typing import Any

import pandas as pd

PROVENANCE_KEY = "_provenance"
RESERVED_COLUMNS = {"sample", "collection", "date", "sample_type", PROVENANCE_KEY}


def select_columns(table: pd.DataFrame, name: str) -> pd.DataFrame:
    """Columns matching shell-glob *name*, case-insensitively
    (manifest.py:491-511); no match is an error."""
    pattern = re.compile(fnmatch.translate(name), re.IGNORECASE)
    matches = [c for c in table.columns.astype(str) if pattern.match(c)]
    assert matches, f"No column name matching {name!r} found; column names are: {list(table.columns)}"
    return table[matches]


def select_column(table: pd.DataFrame, name: str) -> pd.Series:
    """The single column matching *name* (manifest.py:471-488)."""
    matching = select_columns(table, name)
    assert len(matching.columns) == 1, (
        f"More than one column name matching {name!r}: {list(matching.columns)}"
    )
    return matching[matching.columns[0]]


def drop_missing_barcodes(
    sample_column: str | None, collection_column: str | None, parsed: pd.DataFrame
) -> pd.DataFrame:
    """Drop rows with no barcode data (manifest.py:526-566): when both
    columns are configured, a row needs at least one of them."""
    if sample_column and collection_column:
        return parsed.dropna(subset=["sample", "collection"], how="all")
    if sample_column:
        return parsed.dropna(subset=["sample"])
    if collection_column:
        return parsed.dropna(subset=["collection"])
    return parsed


def deduplicate_barcodes(df: pd.DataFrame, columns) -> pd.DataFrame:
    """Drop every row carrying a barcode duplicated within its column
    (manifest.py:568-612): nulls never count as duplicates, and the checks
    intersect across barcode columns."""
    deduplicated = df
    for column in columns:
        col = df[column].dropna()
        duplicates = col[col.duplicated(keep=False)]
        if len(duplicates) > 0:
            keep = df[(~df[column].duplicated(keep=False)) | (df[column].isnull())]
            common = deduplicated.index.intersection(keep.index)
            deduplicated = deduplicated.loc[common]
    return deduplicated


def parse_workbook(
    workbook: str,
    *,
    sheet: str | None = None,
    sample_column: str | None = None,
    collection_column: str | None = None,
    date_column: str | None = None,
    extra_columns: list[tuple[str, str | dict]] | None = None,
    sample_type: str | None = None,
    row_filter: str | None = None,
    opener=None,
) -> list[dict[str, Any]]:
    """_parse parity (manifest.py:278-395): workbook (local path, http(s)
    URL or Google Sheets link) → list of manifest record dicts ready for
    the receiving NDJSON log."""
    from id3c_spark.sources.readers import _parse_xlsx
    from id3c_spark.sources.remote import fetch_local

    extra_columns = extra_columns or []
    if not sample_column and not collection_column:
        raise ValueError("You must specify the sample_column, the collection_column, or both.")
    disallowed = {dst for dst, _ in extra_columns} & RESERVED_COLUMNS
    assert not disallowed, (
        f"A reserved column name has been configured in extra_columns: {disallowed}"
    )

    with fetch_local(workbook, opener=opener) as local:
        with open(local, "rb") as f:
            digest = hashlib.sha1(f.read()).hexdigest()  # noqa: S324 (provenance, not auth)
        rows = _parse_xlsx(local, sheet)
    if not rows:
        return []
    header = [h if h else f"col{i}" for i, h in enumerate(rows[0])]
    width = len(header)
    data = [list((r + [None] * width)[:width]) for r in rows[1:]]
    manifest = pd.DataFrame(data, columns=header, dtype=object)

    # trim + '' / 'na' → None (manifest.py:325-337)
    manifest = manifest.apply(
        lambda col: col.map(
            lambda v: (lambda s: None if s in ("", "na", "NA", "Na", "nA") else s)(v.strip())
            if isinstance(v, str) else None
        )
    )

    if row_filter:
        manifest = manifest.query(row_filter, engine="python")

    column_map: list[tuple[str, dict]] = []
    if sample_column:
        column_map.append(("sample", {"name": sample_column, "barcode": True}))
    if collection_column:
        column_map.append(("collection", {"name": collection_column, "barcode": True}))
    if date_column:
        column_map.append(("date", {"name": date_column}))
    column_map += [
        (dst, src) if isinstance(src, dict) else (dst, {"name": src})
        for dst, src in extra_columns
        if src
    ]

    parsed = pd.DataFrame(index=manifest.index)
    for dst, src in column_map:
        if src.get("multiple"):
            cols = select_columns(manifest, src["name"])
            parsed[dst] = cols.apply(lambda r: [v for v in r], axis="columns")
        else:
            parsed[dst] = select_column(manifest, src["name"])

    barcode_columns = {dst for dst, src in column_map if src.get("barcode")}
    parsed = drop_missing_barcodes(sample_column, collection_column, parsed)
    parsed = deduplicate_barcodes(parsed, barcode_columns)

    if sample_type:
        parsed["sample_type"] = sample_type

    # header row + 1-based indexing (manifest.py:383-389)
    parsed[PROVENANCE_KEY] = [
        {"workbook": workbook, "sha1sum": digest, "sheet": sheet, "row": i + 2}
        for i in parsed.index
    ]
    out = parsed.astype(object).where(pd.notnull(parsed), None)
    return out.to_dict(orient="records")


def parse_using_config(config: dict, opener=None) -> list[dict[str, Any]]:
    """parse-using-config parity (manifest.py:133-275): one YAML/JSON
    config dict with workbook/sheet/columns keys."""
    columns = dict(config.get("columns", {}))
    sample_column = columns.pop("sample", None)
    collection_column = columns.pop("collection", None)
    date_column = columns.pop("date", None)
    return parse_workbook(
        config["workbook"],
        sheet=config.get("sheet"),
        sample_column=sample_column,
        collection_column=collection_column,
        date_column=date_column,
        extra_columns=list(columns.items()),
        sample_type=config.get("sample_type"),
        row_filter=config.get("row_filter"),
        opener=opener,
    )


def record_hash(record: dict, ignore_case: bool = False) -> str:
    """Stable content hash of a manifest record excluding provenance
    (deephash parity, manifest.py:614-619) — the diff key."""
    def canon(v):
        if isinstance(v, str) and ignore_case:
            return v.lower()
        if isinstance(v, list):
            return [canon(x) for x in v]
        if isinstance(v, dict):
            return {k: canon(x) for k, x in sorted(v.items())}
        return v

    body = {k: canon(v) for k, v in sorted(record.items()) if k != PROVENANCE_KEY}
    return hashlib.sha256(json.dumps(body, sort_keys=True, default=str).encode()).hexdigest()


def diff_manifests(a: list[dict], b: list[dict], ignore_case: bool = False) -> list[dict]:
    """Records of *a* not present in *b* by content hash (manifest diff,
    manifest.py:396-436) — provenance ignored."""
    b_hashes = {record_hash(r, ignore_case) for r in b}
    return [r for r in a if record_hash(r, ignore_case) not in b_hashes]
