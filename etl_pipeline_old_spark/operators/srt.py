"""SubRip (SRT) subtitle codec — pure stdlib, WebVTT's older sibling.

Written from the publicly documented SubRip format: numbered cue blocks
separated by blank lines, each an index line, a comma-milliseconds
timing line ``HH:MM:SS,mmm --> HH:MM:SS,mmm``, and one-or-more payload
lines.  No signature line; real files frequently lead with a UTF-8 BOM
(SubRip's Windows heritage), which the parser consumes.

Why this exists: SRT OUTNUMBERS WebVTT in real video corpora — it is
the de-facto interchange format subtitle communities and ripping tools
emit, while VTT is the web-delivery format.  A caption-coverage gate
that reads only .vtt sidecars silently drops most of a crawled video
corpus.  This module parses the same ``(start_ms, end_ms, text)`` cue
tuples as operators/vtt.py, shares its interval-merge stats
(``vtt.cue_stats``), and fails loudly on malformed indices, timing
lines, or reversed cues — a damaged sidecar costs its record, never
the job.
"""

from __future__ import annotations

import re

_TIMING = re.compile(
    r"^(\d{2,}):(\d{2}):(\d{2}),(\d{3})"
    r"\s*-->\s*"
    r"(\d{2,}):(\d{2}):(\d{2}),(\d{3})\s*$"
)


def _ms(h, m, s, ms) -> int:
    return ((int(h) * 60 + int(m)) * 60 + int(s)) * 1000 + int(ms)


def format_ts_srt(ms: int) -> str:
    h, rem = divmod(ms, 3_600_000)
    m, rem = divmod(rem, 60_000)
    s, mil = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d},{mil:03d}"


def write_srt(cues: list) -> str:
    """Serialize ``[(start_ms, end_ms, text)]`` into an SRT document:
    1-based index, comma-millis timing, payload, blank separator."""
    out = []
    for i, (start, end, text) in enumerate(cues, start=1):
        out.append(str(i))
        out.append(f"{format_ts_srt(start)} --> {format_ts_srt(end)}")
        out.append(text)
        out.append("")
    return "\n".join(out)


def parse_srt(doc: str) -> list:
    """Parse into ``[(start_ms, end_ms, text)]``.  A leading UTF-8 BOM
    is consumed; CRLF/CR/LF all normalize.  Cue indices must be
    ascending positive integers (real tools renumber on save; a
    non-numeric or regressing index means a torn file).  Malformed
    timing lines and end<=start cues raise ``ValueError``.  Like the
    W3C VTT rule, a cue block ends only at a truly EMPTY line —
    whitespace-only lines are payload."""
    if doc.startswith("﻿"):
        doc = doc[1:]
    lines = doc.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    n = len(lines)
    i = 0
    cues: list = []
    prev_index = 0
    while i < n:
        if lines[i].strip() == "":
            i += 1
            continue
        idx_line = lines[i].strip()
        if not idx_line.isdigit():
            raise ValueError(f"srt: cue index is not a number {idx_line!r}")
        idx = int(idx_line)
        if idx <= prev_index:
            raise ValueError(
                f"srt: cue index {idx} does not ascend past {prev_index}"
            )
        prev_index = idx
        i += 1
        if i >= n:
            raise ValueError("srt: cue index at end of file")
        m = _TIMING.match(lines[i])
        if not m:
            raise ValueError(f"srt: malformed timing line {lines[i]!r}")
        start = _ms(*m.groups()[:4])
        end = _ms(*m.groups()[4:])
        if end <= start:
            raise ValueError(f"srt: cue ends before it starts ({lines[i]!r})")
        i += 1
        payload = []
        while i < n and lines[i] != "":
            payload.append(lines[i])
            i += 1
        if not payload:
            raise ValueError(f"srt: cue {idx} has no payload")
        cues.append((start, end, "\n".join(payload)))
    return cues


def srt_caption_stats(doc: str) -> dict:
    """Per-document caption structure for an SRT sidecar — the same
    merged-interval stats contract as vtt.caption_stats."""
    from .vtt import cue_stats

    return cue_stats(parse_srt(doc))
