"""Access control layer (SURVEY §4 RLS mapping).

Reference: row-level security on warehouse.sample
(schema/deploy/warehouse/sample/access-role-rls.sql:5-13) + per-view
grants with ``security_invoker = true`` (shipping/views.sql:17,33-39) —
~40 role scripts reduced to: an access-filter wrapper view parameterized
by the caller's roles, and a view→allowed-roles ACL map.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Explicit world-readable marker: a view must OPT IN to public access the
# same way views.sql must issue an explicit ``grant select ... to public``.
PUBLIC = "public"

# per-view grants (views.sql revoke/grant pattern): view name → roles.
# Views NOT registered here are unreadable by everyone — the reference
# revokes from public before granting (views.sql:33-39), so an unregistered
# view failing closed mirrors a view whose deploy script forgot its grants.
VIEW_ACL: dict[str, set[str]] = {
    "presence_absence_result_v1": {"reporter", "incidence-modeler"},
    "presence_absence_result_v2": {"incidence-modeler"},
    "incidence_model_observation_v2": {"incidence-modeler"},
    "observation_with_presence_absence_result_v1": {"incidence-modeler"},
    "sample_with_best_available_encounter_data_v1": {PUBLIC},
}


def rls_filter(sample: DataFrame, roles: Iterable[str]) -> DataFrame:
    """sample RLS: a row with access_role set is visible only to sessions
    holding that role; null access_role is public."""
    role_list = [r.lower() for r in roles]
    return sample.filter(
        F.col("access_role").isNull() | F.lower(F.col("access_role")).isin(role_list)
    )


def can_select(view: str, roles: Iterable[str]) -> bool:
    """Deny-by-default: unknown views are readable by no one; registered
    views require a matching role unless explicitly marked PUBLIC."""
    allowed = VIEW_ACL.get(view)
    if not allowed:
        return False
    return PUBLIC in allowed or bool(allowed & {r.lower() for r in roles})


def check_select(view: str, roles: Iterable[str]) -> None:
    if not can_select(view, roles):
        raise PermissionError(f"permission denied for view {view}")
