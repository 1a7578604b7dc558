"""Age conversion (reference: schema/deploy/functions/age_conversion.sql:5-28).

The reference stores age as a Postgres ``interval`` constrained to month
precision (warehouse/encounter/age.sql:7-8); we store ``age_months INT``
(SURVEY §1.2). For integer months m = 12y + r, the reference's
round(y + r/12, 2) equals round(m/12, 2) exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def age_in_years(age_months: Column) -> Column:
    """round(years + months/12, 2) — matches age_in_years(interval)."""
    return F.round(age_months.cast("double") / 12.0, 2)


def age_in_months(age_months: Column) -> Column:
    """Identity on our representation; kept for API parity."""
    return age_months.cast("int")
