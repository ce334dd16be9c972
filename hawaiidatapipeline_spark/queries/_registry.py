"""Per-module query registration helper."""

from __future__ import annotations


def new_module_registry():
    """Returns (QUERIES, ORACLES, q) — ``q(name, sql=None)`` decorates a
    (spark, sf_dir) -> DataFrame callable into the module's dicts. ``sql=None``
    declares a weak (rows-only) check."""
    queries: dict = {}
    oracles: dict = {}

    def q(name: str, sql: str | None = None):
        def deco(fn):
            queries[name] = fn
            if sql is not None:
                oracles[name] = sql
            return fn

        return deco

    return queries, oracles, q
