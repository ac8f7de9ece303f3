"""Registry-contract tests: the driver hash-checks the FIRST 50 entries of
``queries()`` each round, so registry shape and ordering are load-bearing.

These tests are pure-Python (no SparkSession) — they guard the contract the
round-7 ADVICE flagged (a duplicate dict key silently shrinking the registry)
and the window pin that CORRECTNESS verification depends on.
"""

from __future__ import annotations

import ast
import os

import __spark_entry__ as entrymod

ENTRY_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")


def _dict_literal_string_keys(func_name: str) -> list[str]:
    """All string keys of every dict literal inside the named function."""
    with open(ENTRY_PATH) as fh:
        tree = ast.parse(fh.read())
    keys: list[str] = []
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == func_name:
            for sub in ast.walk(node):
                if isinstance(sub, ast.Dict):
                    for k in sub.keys:
                        if isinstance(k, ast.Constant) and isinstance(k.value, str):
                            keys.append(k.value)
    return keys


def test_queries_dict_literal_has_no_duplicate_keys():
    # A duplicated key in the source dict is silently collapsed at runtime
    # (last wins) but skews the registry count/order accounting the driver
    # window is pinned against (round-7 ADVICE: duplicated "text_quality").
    keys = _dict_literal_string_keys("queries")
    dupes = sorted({k for k in keys if keys.count(k) > 1})
    assert not dupes, f"duplicate registry keys in queries() source: {dupes}"


def test_oracle_sql_dict_literal_has_no_duplicate_keys():
    keys = _dict_literal_string_keys("oracle_sql")
    dupes = sorted({k for k in keys if keys.count(k) > 1})
    assert not dupes, f"duplicate keys in oracle_sql() source: {dupes}"


def test_driver_window_is_pinned_and_leads_registry():
    window = entrymod._DRIVER_WINDOW_R14
    assert len(window) == 50
    assert len(set(window)) == 50
    names = list(entrymod.queries().keys())
    assert names[:50] == window


def test_every_query_has_an_oracle():
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    missing = sorted(qs - oracles)
    assert not missing, f"queries without a DuckDB oracle: {missing}"
