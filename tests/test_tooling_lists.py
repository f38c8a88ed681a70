"""Tooling name-list guards: bench.py HEADLINE, gen_plans SHOWCASE, and
hostile_sweep REPEAT_QUERIES all reference registry queries by name and
FILTER-drop (or merely warn on) unknown names — so a renamed query would
silently vanish from the bench suite, the plans doc, or the idempotency
sweep. Pin every list to the live registry."""

from __future__ import annotations

import importlib.util
import os
import sys

from etl_pipeline_old_spark.registry import QUERIES, _ensure_loaded

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_bench_headline_names_resolve():
    _ensure_loaded()
    bench = _load(os.path.join(_ROOT, "bench.py"), "_bench_for_test")
    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, f"bench.py HEADLINE names not in registry: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicates"


def test_gen_plans_showcase_names_resolve():
    _ensure_loaded()
    gp = _load(
        os.path.join(_ROOT, "tools", "gen_plans.py"), "_gen_plans_for_test"
    )
    missing = [n for n in gp.SHOWCASE if n not in QUERIES]
    assert not missing, f"gen_plans SHOWCASE names not in registry: {missing}"


def test_repeat_sweep_names_resolve():
    _ensure_loaded()
    hs = _load(
        os.path.join(_ROOT, "tools", "hostile_sweep.py"), "_sweep_for_test"
    )
    missing = [n for n in hs.REPEAT_QUERIES if n not in QUERIES]
    assert not missing, f"REPEAT_QUERIES names not in registry: {missing}"
    assert len(set(hs.REPEAT_QUERIES)) == len(hs.REPEAT_QUERIES)
