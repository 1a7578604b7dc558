"""Extension-point plugin loading (SURVEY §2.11 extension points).

The reference discovers extra CLI commands and API routes from installed
distributions via pkg_resources entry points — groups ``id3c.cli.commands``
(lib/id3c/cli/__init__.py:22-31) and ``id3c.api.routes``
(lib/id3c/api/routes.py:386-397) — loaded after the built-in registrations
so extensions may also customize existing routes. This module provides the
same hook over two standard-library channels:

  1. ``importlib.metadata`` entry points in groups
     ``id3c_spark.cli.commands`` / ``id3c_spark.api.routes`` — the
     installed-package parity path.
  2. The ``ID3C_SPARK_CLI_PLUGINS`` / ``ID3C_SPARK_API_PLUGINS``
     environment variables: comma/whitespace-separated ``module`` or
     ``module:attr`` import paths — the deployment hook for un-packaged
     plugins (PYTHONPATH drop-ins), which also makes the mechanism
     testable without installing a distribution.

A loaded extension that is callable is invoked with the registration
target (the click group for CLI plugins, the Flask app for API plugins);
a non-callable module is assumed to have registered via import side
effects, matching the reference's bare ``extension.load()``.
"""

from __future__ import annotations

import importlib
import importlib.metadata
import logging
import os

LOG = logging.getLogger(__name__)

CLI_GROUP = "id3c_spark.cli.commands"
API_GROUP = "id3c_spark.api.routes"
CLI_ENV = "ID3C_SPARK_CLI_PLUGINS"
API_ENV = "ID3C_SPARK_API_PLUGINS"


def _env_specs(env_var: str) -> list[str]:
    raw = os.environ.get(env_var, "")
    return [s.strip() for s in raw.replace(",", " ").split() if s.strip()]


def _load_spec(spec: str):
    mod_name, _, attr = spec.partition(":")
    module = importlib.import_module(mod_name)
    return getattr(module, attr) if attr else module


def load_plugins(group: str, env_var: str, target) -> list[str]:
    """Load every extension in entry-point *group* and in *env_var*,
    handing each the registration *target*. Returns the loaded specs."""
    loaded: list[str] = []
    for ep in importlib.metadata.entry_points(group=group):
        LOG.debug("Loading extension %s (%s) from group %s", ep.name, ep.value, group)
        ext = ep.load()
        if callable(ext):
            ext(target)
        loaded.append(f"{group}:{ep.name}")
    for spec in _env_specs(env_var):
        LOG.debug("Loading extension %s from %s", spec, env_var)
        ext = _load_spec(spec)
        if callable(ext):
            ext(target)
        loaded.append(f"{env_var}:{spec}")
    return loaded


def load_cli_plugins(cli_group) -> list[str]:
    """Register external CLI commands on *cli_group* (click group)."""
    return load_plugins(CLI_GROUP, CLI_ENV, cli_group)


def load_api_plugins(app) -> list[str]:
    """Register external API routes on *app* (Flask application)."""
    return load_plugins(API_GROUP, API_ENV, app)
