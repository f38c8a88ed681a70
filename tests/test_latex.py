"""LaTeX de-markup (operators/latex.py): the constructs naive strippers
garble, staged-fixture recovery, and loud failures."""

from __future__ import annotations

import pytest

from etl_pipeline_old_spark.operators.latex import (
    extract_latex_text, write_latex,
)


def test_staged_fixture_recovery():
    paras = ["alpha beta gamma", "second paragraph here", "third", "4th"]
    r = extract_latex_text(write_latex(paras, doc_id=123))
    lines = [ln for ln in r["text"].split("\n") if ln.strip()]
    assert lines == paras
    assert (r["n_math"], r["n_comments"], r["n_envs"]) == (2, 1, 1)


@pytest.mark.parametrize(
    "src,want",
    [
        (r"\begin{document}a \% of b\end{document}", "a % of b"),
        ("pre % comment\npost", "pre post"),
        (r"\textbf{bold} tail", "bold tail"),
        (r"\emph{nested \textbf{deep}} x", "nested deep x"),
        (r"\noindent  spaced", "spaced"),  # commands eat whitespace
        (r"x $a+b$ y", "x  y"),
        (r"x $$\sum i$$ y", "x  y"),
        (r"\verb|literal $%| z", "literal $% z"),
        (r"\cite{key} w", " w"),  # metadata argument dropped
        (r"\usepackage[utf8]{inputenc}done", "done"),
        (r"a~b", "a b"),
        (r"\section{Head}body", "Headbody"),
        (r"line one\\line two", "line one\nline two"),
        (r"50\$ and \#1 and \_x", "50$ and #1 and _x"),
        ("{bare} groups", "bare groups"),
    ],
)
def test_constructs(src, want):
    assert extract_latex_text(src)["text"] == want


def test_preamble_never_leaks():
    src = (
        "\\documentclass{article}\n\\usepackage{amsmath}\n"
        "% preamble comment\n\\begin{document}body\\end{document}"
    )
    r = extract_latex_text(src)
    assert r["text"].strip() == "body"
    assert "article" not in r["text"] and "amsmath" not in r["text"]
    assert r["n_comments"] == 0  # preamble comments dropped wholesale


def test_math_counted_not_kept():
    r = extract_latex_text("a $x$ b $$y$$ c")
    assert r["n_math"] == 2 and "x" not in r["text"]


@pytest.mark.parametrize(
    "bad",
    [r"$unterminated", r"\input{other}", r"\include{ch1}", r"\verb|open",
     r"\textbf{unbalanced"],
)
def test_loud_failures(bad):
    with pytest.raises(ValueError):
        extract_latex_text(bad)
