"""RTF (Rich Text Format) text extraction — pure stdlib, written from
the public Microsoft RTF 1.9.1 specification.

Why this exists: RTF is the legacy-document staple of real corpora —
decades of exports from word processors, email clients, and records
systems ship as .rtf, and a document pipeline that can read PDF and
DOCX but drops RTF loses exactly the oldest (often least re-obtainable)
slice.  The format is a control-word token stream, and the parts that
silently garble text when skipped are:

- **Destination groups** (``{\\fonttbl ...}``, ``{\\colortbl ...}``,
  ``{\\info ...}``, and every ``{\\*\\...}`` ignorable destination)
  contain TEXT that is metadata, not content — a naive
  strip-the-backslashes pass leaks font names and style sheets into
  the recovered text.
- **``\\uN`` Unicode escapes** carry a SIGNED 16-bit code unit and are
  followed by ``\\ucN`` fallback characters that must be SKIPPED (the
  writer supplies them for pre-Unicode readers; reading both
  duplicates every non-ASCII character).
- **``\\'hh`` hex escapes** decode through the document's declared
  code page (``\\ansicpgN``), not Latin-1 — the cp1251 documents of
  this engine's reference domain garble otherwise.
- **``\\binN``** embeds N raw BYTES that must be skipped blind — they
  can contain ``}`` and backslashes that would desynchronize a text
  scanner.
- ``\\par``/``\\line`` are paragraph/line breaks; ``\\tab`` a tab;
  ``\\~`` a non-breaking space; ``\\{ \\} \\\\`` literal characters.

The writer emits spec-valid RTF (non-ASCII as ``\\uN`` with a ``?``
fallback under ``\\uc1``, specials escaped) so staged corpora prove the
extractor on exactly the constructs above; damage (unbalanced groups,
truncated ``\\bin``) raises ValueError — one record, never the job.
"""

from __future__ import annotations

import re

_CW = re.compile(rb"\\([a-z]+)(-?\d+)? ?", re.S)

# destinations whose group content is metadata, never document text
_SKIP_DESTS = frozenset(
    {
        b"fonttbl", b"colortbl", b"stylesheet", b"info", b"pict",
        b"header", b"footer", b"footnote", b"annotation", b"object",
        b"datastore", b"themedata", b"listtable", b"listoverridetable",
        b"latentstyles", b"generator", b"xmlnstbl",
    }
)


def write_rtf(paragraphs: list, codepage: int = 1252) -> bytes:
    """Serialize paragraphs into spec-valid RTF: ASCII direct (specials
    escaped), everything else as ``\\uN`` signed-16-bit escapes with a
    ``?`` fallback (``\\uc1``), ``\\par`` between paragraphs, plus a
    font table and an ignorable ``{\\*\\generator}`` destination so the
    extractor's metadata-skipping is exercised by every document."""
    out = bytearray(
        b"{\\rtf1\\ansi\\ansicpg%d\\deff0\\uc1" % codepage
        + b"{\\fonttbl{\\f0\\fswiss Helvetica;}}"
        + b"{\\*\\generator etl-pipeline-old-spark 11;}"
        + b"\\f0\\fs24 "
    )
    for i, para in enumerate(paragraphs):
        if i:
            out += b"\\par "
        for ch in para:
            o = ord(ch)
            if ch in "\\{}":
                out += b"\\" + ch.encode()
            elif ch == "\t":
                out += b"\\tab "
            elif ch == "\n":
                out += b"\\line "
            elif 32 <= o < 127:
                out += ch.encode()
            else:
                # signed 16-bit per spec; astral chars as surrogate pair
                if o > 0xFFFF:
                    hi, lo = divmod(o - 0x10000, 0x400)
                    units = (0xD800 + hi, 0xDC00 + lo)
                else:
                    units = (o,)
                for unit in units:
                    u = unit - 0x10000 if unit > 0x7FFF else unit
                    out += b"\\u%d?" % u
    out += b"}"
    return bytes(out)


def extract_rtf_text(blob: bytes) -> list:
    """Extract document text as a list of paragraphs (split at
    ``\\par``), with destination groups skipped, ``\\uN``/``\\ucN``
    honored (surrogate pairs recombined), ``\\'hh`` decoded through the
    declared ``\\ansicpgN``, and ``\\binN`` payloads skipped blind."""
    if not blob.startswith(b"{\\rtf"):
        raise ValueError("rtf: missing {\\rtf signature")
    codepage = "cp1252"
    paras: list = []
    frags: list = []
    hi_surrogate = [0]  # a \uN high surrogate awaiting its low half

    def emit(s: str) -> None:
        # recombine a carried high surrogate with the next \uN unit
        if hi_surrogate[0] and len(s) == 1:
            lo = ord(s)
            if 0xDC00 <= lo <= 0xDFFF:
                frags.append(
                    chr(0x10000 + ((hi_surrogate[0] - 0xD800) << 10)
                        + (lo - 0xDC00))
                )
                hi_surrogate[0] = 0
                return
            hi_surrogate[0] = 0
        frags.append(s)

    # state per group: (uc_skip, in_skipped_destination)
    stack: list = []
    uc_skip, skipping = 1, False
    i, n = 0, len(blob)
    pending_skip = 0  # \ucN fallback characters still to swallow
    while i < n:
        b = blob[i]
        if b == 0x7B:  # {
            stack.append((uc_skip, skipping))
            i += 1
            continue
        if b == 0x7D:  # }
            if not stack:
                # the closing brace of {\rtf1 ...} itself
                if i == n - 1 or not blob[i + 1 :].strip():
                    break
                raise ValueError("rtf: unbalanced group braces")
            uc_skip, skipping = stack.pop()
            i += 1
            continue
        if b == 0x5C:  # backslash
            nxt = blob[i + 1 : i + 2]
            if nxt == b"'":
                raw = blob[i + 2 : i + 4]
                if len(raw) != 2:
                    raise ValueError("rtf: truncated \\'hh escape")
                i += 4
                if pending_skip:
                    pending_skip -= 1
                elif not skipping:
                    try:
                        emit(bytes([int(raw, 16)]).decode(codepage))
                    except (UnicodeDecodeError, LookupError) as exc:
                        raise ValueError(
                            f"rtf: undecodable \\'{raw.decode()} under "
                            f"{codepage}"
                        ) from exc
                continue
            if nxt in (b"\\", b"{", b"}"):
                i += 2
                if pending_skip:
                    pending_skip -= 1
                elif not skipping:
                    emit(nxt.decode())
                continue
            if nxt == b"~":
                i += 2
                if not skipping:
                    emit("\u00a0")
                continue
            if nxt == b"*":
                # ignorable destination: skip the whole group unless the
                # control word that follows is one we understand (none
                # of the text-bearing ones are written as \*)
                skipping = True
                i += 2
                continue
            m = _CW.match(blob, i)
            if not m:
                # a control symbol we don't track (e.g. \-) — drop it
                i += 2
                continue
            word, num = m.group(1), m.group(2)
            i = m.end()
            if word == b"bin":
                length = int(num or 0)
                if i + length > n:
                    raise ValueError("rtf: truncated \\bin payload")
                i += length  # raw bytes, skipped blind
                continue
            if word == b"u":
                unit = int(num or 0)
                if unit < 0:
                    unit += 0x10000
                pending_skip = uc_skip
                if not skipping:
                    if 0xD800 <= unit <= 0xDBFF:
                        hi_surrogate[0] = unit
                    else:
                        emit(chr(unit))
                continue
            if word == b"uc":
                uc_skip = int(num or 1)
                continue
            if word == b"ansicpg":
                codepage = f"cp{int(num or 1252)}"
                continue
            if word in _SKIP_DESTS:
                skipping = True
                continue
            if not skipping:
                if word == b"par":
                    paras.append("".join(frags))
                    frags.clear()
                elif word in (b"line",):
                    emit("\n")
                elif word == b"tab":
                    emit("\t")
            continue
        if b in (0x0D, 0x0A):
            i += 1  # raw CR/LF in the token stream is ignored per spec
            continue
        i += 1
        if pending_skip:
            pending_skip -= 1
        elif not skipping:
            emit(chr(b))
    if stack:
        raise ValueError("rtf: unbalanced group braces at EOF")
    paras.append("".join(frags))
    return paras
