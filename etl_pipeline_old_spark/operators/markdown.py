"""Markdown de-markup for text extraction — pure stdlib, from the
CommonMark structure.

Why this exists: Markdown is the documentation half of every code
corpus (READMEs, docs sites, wikis) and the prose half of many chat/
forum dumps.  De-markup recovers the text; the constructs a naive
regex pass garbles:

- **Fenced code blocks** (``` / ~~~): their content is CODE, not prose
  — separated out and counted, with the fence-state machine proof
  against prose that merely contains backticks.  An unclosed fence
  raises (a truncated file, not a style choice).
- **Links and images**: ``[text](url)`` keeps TEXT and drops the url;
  ``![alt](url)`` keeps the alt.  Reference-style ``[text][id]`` keeps
  text; definition lines ``[id]: url`` are metadata, dropped.
- **Inline code** ``` `x` ``` keeps its payload verbatim (it may
  contain the emphasis markers below — order matters).
- **Emphasis** ``**x**``/``__x__``/``*x*``/``_x_`` unwraps to x.
- **Line prefixes**: ATX headers (#..###### + space, COUNTED — the
  heading-density signal), blockquote ``>`` chains, and list markers
  (``- * +`` or ``1.``) strip; setext underlines (``===``/``---``
  under a text line) drop.

Output: ``{"text", "code_chars", "n_headers", "n_links", "n_fences"}``.
"""

from __future__ import annotations

import re

_LINK = re.compile(r"!?\[([^\]]*)\]\(([^)]*)\)")
_REFLINK = re.compile(r"\[([^\]]*)\]\[[^\]]*\]")
_REFDEF = re.compile(r"^\s*\[[^\]]+\]:\s+\S+\s*$")
_CODE = re.compile(r"`([^`]*)`")
_EMPH = re.compile(r"(\*\*|__)(.+?)\1|(\*|_)(.+?)\3")
# markers consume exactly ONE separator space: further
# whitespace belongs to the CONTENT (lossless-extraction bias —
# a paragraph starting with spaces survives byte-exactly)
_HEADER = re.compile(r"^(#{1,6}) (.*)$")
_LIST = re.compile(r"^(\s{0,3})(?:[-*+]|\d+\.) (.*)$")
_SETEXT = re.compile(r"^\s*(=+|-+)\s*$")


def _unwrap_inline(line: str, counters: dict) -> str:
    # inline code FIRST: its payload is verbatim and may contain markers
    parts = []
    at = 0
    for m in _CODE.finditer(line):
        seg = line[at : m.start()]
        parts.append(("md", seg))
        parts.append(("code", m.group(1)))
        at = m.end()
    parts.append(("md", line[at:]))
    out = []
    for kind, seg in parts:
        if kind == "code":
            out.append(seg)
            continue
        def _link(m):
            counters["n_links"] += 1
            return m.group(1)
        seg = _LINK.sub(_link, seg)
        seg = _REFLINK.sub(lambda m: m.group(1), seg)
        prev = None
        while prev != seg:  # nested emphasis unwraps iteratively
            prev = seg
            seg = _EMPH.sub(
                lambda m: m.group(2) if m.group(2) is not None
                else m.group(4),
                seg,
            )
        out.append(seg)
    return "".join(out)


def extract_markdown_text(src: str) -> dict:
    lines = src.replace("\r\n", "\n").split("\n")
    prose: list = []
    code_chars = 0
    counters = {"n_links": 0}
    n_headers = n_fences = 0
    fence: str | None = None
    for idx, raw in enumerate(lines):
        stripped = raw.strip()
        if fence is not None:
            if stripped.startswith(fence):
                fence = None
                continue
            code_chars += len(raw)
            continue
        if stripped.startswith("```") or stripped.startswith("~~~"):
            fence = stripped[:3]
            n_fences += 1
            continue
        if _REFDEF.match(raw):
            continue
        if _SETEXT.match(raw) and prose and prose[-1].strip():
            # a setext underline promotes the PREVIOUS line to a header
            n_headers += 1
            continue
        line = raw
        m = _HEADER.match(line)
        if m:
            n_headers += 1
            line = m.group(2)
        while line.startswith(">"):
            line = line[1:]
            if line.startswith(" "):
                line = line[1:]
        lm = _LIST.match(line)
        if lm:
            line = lm.group(2)
        prose.append(_unwrap_inline(line, counters))
    if fence is not None:
        raise ValueError("markdown: unclosed code fence (truncated file?)")
    return {
        "text": "\n".join(prose),
        "code_chars": code_chars,
        "n_headers": n_headers,
        "n_links": counters["n_links"],
        "n_fences": n_fences,
    }


def write_markdown(paragraphs: list, doc_id: int = 0) -> str:
    """Stage a .md document: paragraphs routed through a header, bold,
    blockquote, list-item, and link constructs in rotation, plus one
    fenced code block.  Recovery contract: the extracted text's
    NONEMPTY lines are exactly ``paragraphs`` in order."""
    shapes = (
        "## %s",
        "**%s**",
        "> %s",
        "- %s",
        "[%s](https://example.invalid/doc%d)",
    )
    out = []
    for k, para in enumerate(paragraphs):
        shape = shapes[k % 5]
        out.append(
            shape % (para, doc_id) if "%d" in shape else shape % para
        )
    out += [
        "```python",
        f"print({doc_id})",
        "```",
        f"[ref{doc_id}]: https://example.invalid/ref",
    ]
    return "\n".join(out)
