"""JSON operations with Postgres jsonb parity (SURVEY §2.8 JSON).

The reference keeps exact document text (receiving ``json`` columns) and
queries/merges via jsonb operators. We keep raw strings and:
  - extract with get_json_object / from_json (Catalyst JsonExpressions);
  - shallow (top-level-only) merge ``jsonb || jsonb`` as an Arrow-batched
    pandas UDF — the one place a UDF is justified, because generic jsonb
    has no fixed schema (used only in the MERGE write path, never in
    analytical scans; reference: lib/id3c/db/__init__.py:229,305).
"""

from __future__ import annotations

import json
from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def json_extract(doc: Column, path: str) -> Column:
    """``document ->> 'k'`` / jsonpath text extraction."""
    return F.get_json_object(doc, path)


def json_typeof_object(doc: Column) -> Column:
    """``json_typeof(document) = 'object'`` check
    (receiving/presence-absence.sql:12-13) — validation on write."""
    return F.trim(doc).startswith("{")


@F.pandas_udf(T.StringType())
def json_merge_udf(left: pd.Series, right: pd.Series) -> pd.Series:
    """Top-level-only merge of two JSON object strings, right biased.

    Exact ``coalesce(details, '{}') || new`` semantics
    (lib/id3c/cli/command/etl/__init__.py:91,128): keys from right replace
    keys in left wholesale (no deep merge). NaN/Infinity are rejected the
    way lib/id3c/json.py:56-65 rejects them.
    """

    def merge(a: object, b: object) -> object:
        base = json.loads(a) if isinstance(a, str) and a.strip() else {}
        over = json.loads(b) if isinstance(b, str) and b.strip() else {}
        if not isinstance(base, dict) or not isinstance(over, dict):
            raise ValueError("json_merge expects JSON objects")
        base.update(over)
        return json.dumps(base, allow_nan=False, sort_keys=True, separators=(",", ":"))

    return pd.Series([merge(a, b) for a, b in zip(left, right)])


def json_remove_keys(doc: Column, keys: Sequence[str]) -> Column:
    """Drop top-level *keys* from a JSON object string (``details - 'note'``,
    redcap_sync.py:341 ``sample.details.pop("note")``). Pandas UDF because
    generic jsonb has no fixed schema; only ever applied to the (small)
    REDCap-unlink row set on the deletion-sync path, never in scans."""

    key_set = set(keys)

    @F.pandas_udf(T.StringType())
    def _remove(col: pd.Series) -> pd.Series:
        def rm(a: object) -> object:
            if not (isinstance(a, str) and a.strip()):
                return None
            obj = json.loads(a)
            if not isinstance(obj, dict):
                return a
            for k in key_set:
                obj.pop(k, None)
            return json.dumps(obj, allow_nan=False, sort_keys=True, separators=(",", ":"))

        return pd.Series([rm(a) for a in col])

    return _remove(doc)


def json_contains_struct(doc: Column, required: dict) -> Column:
    """``document @> '{"k": "v", ...}'`` for flat scalar containment — the
    form the reference actually uses (DET filter,
    lib/id3c/cli/command/etl/redcap_det.py:127-135). Compiles to ANDed
    get_json_object equality predicates, fully pushdown-friendly."""
    cond = F.lit(True)
    for key, value in required.items():
        cond = cond & (F.get_json_object(doc, f"$.{key}") == F.lit(str(value)))
    return cond
