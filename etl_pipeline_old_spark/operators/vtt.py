"""WebVTT subtitle codec — pure stdlib.

Written from the public WebVTT specification (W3C): the ``WEBVTT``
signature, blank-line-separated cue blocks, optional cue identifiers,
``HH:MM:SS.mmm --> HH:MM:SS.mmm`` timing lines (hours optional on
input), and multi-line cue payloads.

Why this exists: video-text pair corpora (the video analogue of the
LAION image-caption shape) bind a video track to its subtitle track —
YT-style corpora ship captions as WebVTT/SRT.  Before any pairing, the
pipeline needs per-document caption structure: cue counts, covered time
(with overlapping cues MERGED, not double-counted), span, and payload
size.  This module parses that structure and fails loudly on a
malformed header, timing line, or non-monotonic cue timing — a damaged
sidecar costs its record, never the job.
"""

from __future__ import annotations

import re

_TIMING = re.compile(
    r"^(?:(\d+):)?(\d{2}):(\d{2})\.(\d{3})"
    r" --> "
    r"(?:(\d+):)?(\d{2}):(\d{2})\.(\d{3})\s*$"
)


def _ms(h, m, s, ms) -> int:
    return ((int(h or 0) * 60 + int(m)) * 60 + int(s)) * 1000 + int(ms)


def format_ts(ms: int) -> str:
    h, rem = divmod(ms, 3_600_000)
    m, rem = divmod(rem, 60_000)
    s, mil = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d}.{mil:03d}"


def write_vtt(cues: list, meta: dict | None = None) -> str:
    """Serialize ``[(start_ms, end_ms, text)]`` into a WebVTT document.
    ``meta`` adds YT-style header metadata lines (``Kind: captions`` /
    ``Language: en``) between the signature and the first blank line."""
    out = ["WEBVTT"]
    for k, v in (meta or {}).items():
        out.append(f"{k}: {v}")
    out.append("")
    for i, (start, end, text) in enumerate(cues, start=1):
        out.append(str(i))
        out.append(f"{format_ts(start)} --> {format_ts(end)}")
        out.append(text)
        out.append("")
    return "\n".join(out)


def parse_vtt(doc: str) -> list:
    """Parse into ``[(start_ms, end_ms, text)]``.  Cue identifiers, the
    optional header block (``Kind: captions`` / ``Language: en`` style
    metadata before the first blank line), and NOTE comment blocks are
    handled per spec; malformed timing lines and end<=start cues raise
    ``ValueError``.

    Per the W3C parsing algorithm a cue block ends at an EMPTY line —
    a line containing only spaces/tabs is cue payload, not a boundary
    (round-9 Hypothesis counterexample ``cues=[(0, 1, ' ')]``).  Line
    terminators CRLF/CR/LF are all normalized before splitting.
    """
    lines = doc.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    if not lines or not lines[0].strip().startswith("WEBVTT"):
        raise ValueError("vtt: missing WEBVTT signature")
    n = len(lines)
    # Header block: everything after the signature line up to the first
    # blank line is metadata (per spec, collected and discarded).  Per the
    # W3C algorithm, header collection also ends when a line contains
    # '-->' — that line IS the first cue's timing line (files with no
    # blank line between signature and first cue are valid), so leave it
    # for the cue loop.
    i = 1
    while i < n and lines[i] != "" and "-->" not in lines[i]:
        i += 1
    cues = []
    while i < n:
        if lines[i] == "":
            i += 1
            continue
        if lines[i].startswith("NOTE"):
            while i < n and lines[i] != "":
                i += 1
            continue
        # optional identifier line (anything without '-->')
        if "-->" not in lines[i]:
            i += 1
            if i >= n:
                raise ValueError("vtt: cue identifier at end of file")
        m = _TIMING.match(lines[i])
        if not m:
            raise ValueError(f"vtt: malformed timing line {lines[i]!r}")
        start = _ms(*m.groups()[:4])
        end = _ms(*m.groups()[4:])
        if end <= start:
            raise ValueError(f"vtt: cue ends before it starts ({lines[i]!r})")
        i += 1
        payload = []
        while i < n and lines[i] != "":
            payload.append(lines[i])
            i += 1
        cues.append((start, end, "\n".join(payload)))
    return cues


def header_meta(doc: str) -> dict:
    """Extract the header block's ``Key: value`` metadata lines (the part
    ``parse_vtt`` skips): ``{'Kind': 'captions', 'Language': 'en'}``-style.
    Lines without a colon are ignored; stops at the first empty line."""
    lines = doc.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    if not lines or not lines[0].strip().startswith("WEBVTT"):
        raise ValueError("vtt: missing WEBVTT signature")
    meta = {}
    for ln in lines[1:]:
        if ln == "" or "-->" in ln:
            # a timing line ends the header block (it is never metadata),
            # mirroring parse_vtt's W3C header-collection rule
            break
        key, sep, val = ln.partition(":")
        if sep:
            meta[key.strip()] = val.strip()
    return meta


def caption_stats(doc: str) -> dict:
    """Per-document caption structure: ``n_cues``, ``covered_ms`` (union
    of cue intervals — overlaps merged, not double-counted),
    ``first_start_ms``, ``last_end_ms``, ``n_chars`` (payload
    characters across cues, newlines excluded)."""
    return cue_stats(parse_vtt(doc))


def cue_stats(cues: list) -> dict:
    """The format-independent half of ``caption_stats``: structure stats
    over ``[(start_ms, end_ms, text)]`` cues from ANY subtitle format
    (WebVTT here, SRT in operators/srt.py)."""
    if not cues:
        return {
            "n_cues": 0, "covered_ms": 0, "first_start_ms": 0,
            "last_end_ms": 0, "n_chars": 0,
        }
    ivs = sorted((s, e) for s, e, _ in cues)
    covered = 0
    cur_s, cur_e = ivs[0]
    for s, e in ivs[1:]:
        if s > cur_e:
            covered += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    covered += cur_e - cur_s
    return {
        "n_cues": len(cues),
        "covered_ms": covered,
        "first_start_ms": min(s for s, _e, _t in cues),
        "last_end_ms": max(e for _s, e, _t in cues),
        "n_chars": sum(len(t.replace("\n", "")) for _s, _e, t in cues),
    }
