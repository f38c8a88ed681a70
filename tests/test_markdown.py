"""Markdown de-markup (operators/markdown.py): fence state machine,
inline precedence, marker semantics, and the staged-fixture contract."""

from __future__ import annotations

import pytest

from etl_pipeline_old_spark.operators.markdown import (
    extract_markdown_text, write_markdown,
)


def test_staged_fixture_recovery():
    paras = ["alpha beta", "second para", "third here", "fourth x",
             "fifth y", "sixth z"]
    r = extract_markdown_text(write_markdown(paras, doc_id=42))
    lines = [ln for ln in r["text"].split("\n") if ln.strip()]
    assert lines == paras
    assert r["n_headers"] == 2  # k=0 and k=5 rotate into headers
    assert r["n_links"] == 1
    assert r["n_fences"] == 1
    assert r["code_chars"] == len("print(42)")


@pytest.mark.parametrize(
    "src,want",
    [
        ("# Head\nbody", "Head\nbody"),
        ("plain `**not bold**` here", "plain **not bold** here"),
        ("a [link](http://x) b", "a link b"),
        ("![alt text](img.png)", "alt text"),
        ("**bold _nested_ x**", "bold nested x"),
        ("> > double quote", "double quote"),
        ("1. numbered item", "numbered item"),
        ("Title\n===\nbody", "Title\nbody"),
        ("ref style [txt][1] end", "ref style txt end"),
        ("[1]: http://example.com", ""),
        # markers consume exactly ONE space: content whitespace survives
        ("##  two spaces", " two spaces"),
        (">  kept", " kept"),
    ],
)
def test_constructs(src, want):
    assert extract_markdown_text(src)["text"].strip("\n") == want


def test_fence_state_machine():
    r = extract_markdown_text("before\n```\n**code** [x](y)\n```\nafter")
    assert r["code_chars"] == len("**code** [x](y)")
    assert "code" not in r["text"]
    assert r["n_links"] == 0  # link syntax inside a fence is code
    # inline backticks never open fences
    r2 = extract_markdown_text("a `b` c\nafter")
    assert r2["n_fences"] == 0 and r2["text"] == "a b c\nafter"


def test_header_count_is_density_signal():
    r = extract_markdown_text("# a\n## b\n###### c\nplain\nSet\n---\n")
    assert r["n_headers"] == 4  # three ATX + one setext


def test_unclosed_fence_is_loud():
    with pytest.raises(ValueError, match="unclosed"):
        extract_markdown_text("```\nnever closed")
