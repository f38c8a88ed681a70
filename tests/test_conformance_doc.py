"""CONFORMANCE.md must stay in sync with the codec inventory (r13
verdict #6): every operators/ module appears either as a codec row or
in the non-codec exclusion list; every row carries a pin class from
the defined taxonomy and an evidence file that exists; and every
spec-structure+roundtrip row states WHY no stronger pin is available
— zero undocumented roundtrip-only pins."""

from __future__ import annotations

import glob
import os
import re

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DOC = os.path.join(_ROOT, "CONFORMANCE.md")

_PIN_CLASSES = {"spec-vector", "cross-validated", "spec-structure+roundtrip"}


def _rows() -> dict[str, dict]:
    text = open(_DOC, encoding="utf-8").read()
    rows: dict[str, dict] = {}
    for line in text.splitlines():
        m = re.match(r"^\| (\w+) \| (.+?) \| (.+?) \| (.+?) \| (.+?) \|$",
                     line)
        if m and m.group(1) not in ("module",):
            rows[m.group(1)] = {
                "format": m.group(2),
                "pins": {p.strip() for p in m.group(3).split(" + ")},
                "evidence": m.group(4),
                "notes": m.group(5),
            }
    return rows


def _excluded() -> set[str]:
    text = open(_DOC, encoding="utf-8").read()
    section = text.split("## Not codecs")[1].split("##")[0]
    return set(re.findall(r"`(\w+)`", section))


def test_every_operator_module_is_audited():
    mods = {
        os.path.basename(p)[:-3]
        for p in glob.glob(
            os.path.join(_ROOT, "etl_pipeline_old_spark/operators/*.py")
        )
    } - {"__init__"}
    rows = _rows()
    excluded = _excluded()
    missing = mods - set(rows) - excluded
    assert not missing, f"codecs absent from CONFORMANCE.md: {missing}"
    stale = (set(rows) | excluded) - mods
    assert not stale, f"CONFORMANCE.md rows for deleted modules: {stale}"
    assert not set(rows) & excluded


def test_rows_carry_valid_pins_and_live_evidence():
    for mod, row in _rows().items():
        assert row["pins"] and row["pins"] <= _PIN_CLASSES, (
            mod, row["pins"],
        )
        for ev in re.findall(r"tests/\S+\.py", row["evidence"]):
            assert os.path.exists(os.path.join(_ROOT, ev)), (mod, ev)
        assert re.search(r"tests/test_\w+\.py", row["evidence"]), mod


def test_roundtrip_only_rows_state_why():
    """The honest-blind-spot rule: a row pinned only by its own
    roundtrip must say why nothing stronger exists in-container."""
    for mod, row in _rows().items():
        if row["pins"] == {"spec-structure+roundtrip"}:
            assert re.search(
                r"no (independent|stdlib|formal)|not a byte codec|"
                r"probe only|no reference implementation",
                row["notes"],
                flags=re.I,
            ), f"{mod}: roundtrip-only pin without a stated reason"


def test_spec_vector_claims_reference_real_tests():
    """Rows claiming spec-vector must point at a test file that
    actually contains a vector-looking pin (a literal assertion on
    published constants), not just exist."""
    for mod, row in _rows().items():
        if "spec-vector" not in row["pins"]:
            continue
        evs = re.findall(r"tests/\S+?\.py", row["evidence"])
        assert evs, mod
        blob = "".join(
            open(os.path.join(_ROOT, ev), encoding="utf-8").read()
            for ev in evs
        )
        assert re.search(
            r"vector|published|spot pin|worked example|check value",
            blob,
            flags=re.I,
        ), f"{mod}: spec-vector claim with no vector in {evs}"
