"""User/role administration (reference: lib/id3c/cli/command/user.py,
lib/id3c/db/__init__.py:104-153).

The reference manages Postgres roles (``create user``, ``grant role``,
``alter user password``) and lists users with an ``array_agg(groname order
by groname)`` roles column (user.py:88-97). Spark has no database users —
the cluster-side analog is a small registry the access layer (access.py
VIEW_ACL / rls_filter) consumes for its role sets. Same operations, same
semantics:

  - create_user(name, comment)        — errors if the user exists, like
    Postgres ``create user`` (db/__init__.py:104-117);
  - grant_roles(name, roles)          — idempotent set-union grants, no-op
    warning path on empty roles (db/__init__.py:120-135);
  - reset_password(name)              — ``secrets.token_urlsafe()`` random
    password, returned to the caller (db/__init__.py:138-153); only a
    salted sha256 digest is stored;
  - list_users()                      — name-ordered, each with its
    role list sorted (the array_agg order-by parity).

State is a JSON file under the warehouse directory — the same
copy-on-write discipline as sources/store.py (write temp, atomic rename).
"""

from __future__ import annotations

import hashlib
import json
import os
import secrets
import tempfile


class UserExistsError(ValueError):
    pass


class NoSuchUserError(KeyError):
    pass


class UserRegistry:
    def __init__(self, path: str) -> None:
        self.path = path

    # --- state io (atomic replace, store.py discipline) -------------------

    def _load(self) -> dict:
        if not os.path.exists(self.path):
            return {"users": {}}
        with open(self.path) as f:
            return json.load(f)

    def _save(self, state: dict) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.path) or ".")
        with os.fdopen(fd, "w") as f:
            json.dump(state, f, indent=2, sort_keys=True)
        os.replace(tmp, self.path)

    # --- operations (user.py / db/__init__.py parity) ---------------------

    def create_user(self, name: str, comment: str | None = None) -> None:
        state = self._load()
        if name in state["users"]:
            raise UserExistsError(f"user {name!r} already exists")
        state["users"][name] = {"comment": comment, "roles": [], "password": None}
        self._save(state)

    def grant_roles(self, name: str, roles: list[str]) -> None:
        if not roles:
            return  # reference warns and grants nothing (db/__init__.py:124-126)
        state = self._load()
        user = state["users"].get(name)
        if user is None:
            raise NoSuchUserError(name)
        user["roles"] = sorted(set(user["roles"]) | set(roles))
        self._save(state)

    def reset_password(self, name: str) -> str:
        state = self._load()
        user = state["users"].get(name)
        if user is None:
            raise NoSuchUserError(name)
        new_password = secrets.token_urlsafe()
        salt = secrets.token_hex(8)
        digest = hashlib.sha256((salt + new_password).encode()).hexdigest()
        user["password"] = f"{salt}${digest}"
        self._save(state)
        return new_password

    def check_password(self, name: str, password: str) -> bool:
        user = self._load()["users"].get(name)
        if user is None or not user.get("password"):
            return False
        salt, digest = user["password"].split("$", 1)
        return hashlib.sha256((salt + password).encode()).hexdigest() == digest

    def roles_of(self, name: str) -> list[str]:
        """Feed for access.can_select / rls_filter role sets."""
        user = self._load()["users"].get(name)
        if user is None:
            raise NoSuchUserError(name)
        return list(user["roles"])

    def list_users(self) -> list[dict]:
        """Name-ordered users, roles sorted (user.py:88-97 array_agg)."""
        state = self._load()
        return [
            {"name": n, "description": u.get("comment"), "roles": sorted(u["roles"])}
            for n, u in sorted(state["users"].items())
        ]
