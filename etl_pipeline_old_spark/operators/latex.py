"""LaTeX de-markup for text extraction — pure stdlib, written from the
public TeXbook/LaTeX2e command syntax.

Why this exists: scientific corpora (the arXiv slice every pretraining
mix names) ship as LaTeX source, and the curation step is de-markup —
recover the prose, drop the typesetting.  The constructs that garble
text when handled naively:

- **Comments**: an UNESCAPED ``%`` kills the rest of the line — but
  ``\\%`` is a literal percent, and a comment-eating pass that misses
  the distinction deletes real text.
- **Commands**: ``\\cmd`` swallows following whitespace (the TeX rule —
  ``\\emph{x} y`` has a space, ``\\noindent y`` does not double it);
  known METADATA commands drop their braced argument entirely
  (``\\documentclass{article}`` must not leak "article" into prose),
  while unknown/styling commands KEEP their argument's content
  (``\\textbf{word}`` → word), which is what the arXiv cleaners do.
- **Math**: ``$...$`` and ``$$...$$`` segments are notation, not prose
  — dropped, but COUNTED (the math-density signal quality filters
  use).  An unterminated math segment raises.
- **Escapes**: ``\\% \\& \\_ \\$ \\{ \\} \\#`` are literal characters;
  ``~`` is a non-breaking space; ``\\\\`` is a line break.
- **Environments**: ``\\begin{X}``/``\\end{X}`` markers drop, their
  CONTENT survives (an itemize's items are prose).  ``\\verb|..|``
  emits its delimiter-bounded payload verbatim.
- The **preamble** (everything before ``\\begin{document}``) is
  typesetting configuration, never prose — dropped wholesale when the
  document declares one.

``\\input``/``\\include`` (cross-file assembly) raise — a multi-file
paper needs resolution the blob cannot provide; one record, loudly.
"""

from __future__ import annotations

import re

# commands whose braced argument is metadata, never prose
_DROP_ARG = frozenset(
    {
        "documentclass", "usepackage", "label", "ref", "eqref", "cite",
        "citep", "citet", "bibliography", "bibliographystyle", "begin",
        "end", "vspace", "hspace", "includegraphics", "pagestyle",
        "newcommand", "renewcommand", "def", "setlength", "date",
    }
)
_FORBIDDEN = frozenset({"input", "include"})
_CMD = re.compile(r"[A-Za-z]+\*?")


def extract_latex_text(src: str) -> dict:
    """De-markup LaTeX source → ``{"text", "n_math", "n_comments",
    "n_envs"}``.  See the module docstring for the semantics."""
    # drop the preamble when a document body is declared
    at = src.find("\\begin{document}")
    body = src[at:] if at >= 0 else src
    out: list = []
    n_math = n_comments = n_envs = 0
    i, n = 0, len(body)
    while i < n:
        ch = body[i]
        if ch == "%":
            eol = body.find("\n", i)
            i = n if eol < 0 else eol + 1
            n_comments += 1
            continue
        if ch == "$":
            dd = body.startswith("$$", i)
            close = body.find("$$" if dd else "$", i + (2 if dd else 1))
            if close < 0:
                raise ValueError("latex: unterminated math segment")
            i = close + (2 if dd else 1)
            n_math += 1
            continue
        if ch == "~":
            out.append(" ")
            i += 1
            continue
        if ch in "{}":
            i += 1  # bare groups are transparent
            continue
        if ch == "\\":
            nxt = body[i + 1 : i + 2]
            if nxt and nxt in "%&_$#{}":
                out.append(nxt)
                i += 2
                continue
            if nxt == "\\":
                out.append("\n")
                i += 2
                continue
            m = _CMD.match(body, i + 1)
            if not m:
                i += 2  # control symbol we don't track (\, \; etc.)
                continue
            name = m.group(0).rstrip("*")
            i = m.end()
            if name in _FORBIDDEN:
                raise ValueError(
                    f"latex: \\{name} needs cross-file resolution — "
                    "multi-file papers are a documented seam"
                )
            if name == "verb":
                if i >= n:
                    raise ValueError("latex: \\verb at end of input")
                delim = body[i]
                close = body.find(delim, i + 1)
                if close < 0:
                    raise ValueError("latex: unterminated \\verb")
                out.append(body[i + 1 : close])
                i = close + 1
                continue
            if name == "item":
                # an item marker separates prose; the TeX whitespace
                # rule below still applies
                out.append("\n")
            # the TeX rule: a command named by LETTERS swallows the
            # whitespace that follows it
            while i < n and body[i] in " \t":
                i += 1
            # optional [..] argument (metadata: drop)
            if i < n and body[i] == "[":
                close = body.find("]", i)
                if close < 0:
                    raise ValueError("latex: unterminated [..] argument")
                i = close + 1
            if i < n and body[i] == "{":
                depth, j = 1, i + 1
                while j < n and depth:
                    if body[j] == "\\":
                        j += 2
                        continue
                    if body[j] == "{":
                        depth += 1
                    elif body[j] == "}":
                        depth -= 1
                    j += 1
                if depth:
                    raise ValueError("latex: unbalanced braces")
                arg = body[i + 1 : j - 1]
                if name == "begin" or name == "end":
                    n_envs += name == "begin"
                    if arg == "document":
                        pass  # structural, no prose either way
                elif name not in _DROP_ARG:
                    # styling/sectioning: the argument IS prose — recurse
                    sub = extract_latex_text(arg)
                    out.append(sub["text"])
                    n_math += sub["n_math"]
                    n_comments += sub["n_comments"]
                    n_envs += sub["n_envs"]
                i = j
            continue
        out.append(ch)
        i += 1
    return {
        "text": "".join(out),
        "n_math": n_math,
        "n_comments": n_comments,
        "n_envs": n_envs,
    }


def write_latex(paragraphs: list, doc_id: int = 0) -> str:
    """Stage a .tex document whose prose is ``paragraphs`` routed
    through the constructs the extractor must handle: alternating
    styling commands, inline and display math segments, comments, and
    a preamble that must not leak.  Recovery contract: the extracted
    text's NONEMPTY lines are exactly ``paragraphs`` in order."""
    lines = [
        "% staged corpus fixture (this comment must not leak)",
        "\\documentclass[11pt]{article}",
        "\\usepackage{amsmath}",
        "\\begin{document}",
        f"% doc {doc_id} body follows",
    ]
    wraps = ("\\textbf{%s}", "\\emph{%s}", "%s", "\\mbox{%s}")
    for k, para in enumerate(paragraphs):
        lines.append(wraps[k % 4] % para)
        if k == 0:
            lines.append(f"$e_{{{doc_id}}} = mc^2$")
    lines.append(f"$$\\sum_{{i=0}}^{{{doc_id}}} i$$")
    lines.append("\\end{document}")
    return "\n".join(lines)
