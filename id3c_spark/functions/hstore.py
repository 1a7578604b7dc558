"""hstore emulation as MapType(String, String) (SURVEY §1.2, §2.8).

Reference usages:
  - parse from ``'country => us, state => wa'`` text with lowercasing
    (lib/id3c/cli/command/etl/__init__.py:393-399).
  - right-biased concat ``hierarchy || new_pairs``
    (etl/__init__.py:450-456, location.py:245) — map_concat with
    ``spark.sql.mapKeyDedupPolicy=LAST_WIN`` (set in session.py) matches.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_hstore(text: Column) -> Column:
    """Parse ``'k => v, k2 => v2'`` into a map, lowercased.

    Delimiters are regexes so surrounding whitespace is absorbed, matching
    the reference's ``.strip().lower()`` normalization.
    """
    return F.str_to_map(F.lower(F.trim(text)), F.lit(",\\s*"), F.lit("\\s*=>\\s*"))


def hstore_concat(left: Column, right: Column) -> Column:
    """Right-biased merge (Postgres ``hstore || hstore``).

    Relies on mapKeyDedupPolicy=LAST_WIN; nulls behave like Postgres
    (null || x = x is NOT hstore semantics — hstore null || x = null — but
    the reference always coalesces first, so mirror that with coalesce).
    """
    return F.map_concat(
        F.coalesce(left, F.create_map()),
        F.coalesce(right, F.create_map()),
    )
