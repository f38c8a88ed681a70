"""Charset detection + transcoding for crawled web bytes — pure stdlib.

Real crawl data is NOT all UTF-8: the reference pipeline's domain is
Russian-language web/BIM data (AtomicBim/etl-pipeline-old's extractors
target RU-market systems), and Russian web pages ship as Windows-1251 or
KOI8-R about as often as UTF-8 in legacy crawls.  A corpus pipeline that
assumes UTF-8 silently drops or mangles exactly the documents the
reference cares about.

Detection cascade (the order real browsers and the WHATWG encoding
sniffing algorithm use — strongest declaration wins):

1. **BOM** — UTF-8 / UTF-16 LE / UTF-16 BE byte-order marks override
   everything (WHATWG encoding §4.2).
2. **HTTP header** — the ``charset=`` parameter of the response's
   Content-Type.
3. **HTML meta prescan** — ``<meta charset=...>`` or the legacy
   ``<meta http-equiv="Content-Type" content="...charset=...">`` within
   the first 1024 bytes (the HTML spec's prescan window).  Both legacy
   Cyrillic charsets are ASCII supersets, so scanning the raw bytes as
   ASCII is sound.
4. **UTF-8 validity** — a strict UTF-8 decode succeeding is taken as
   UTF-8 (multi-byte UTF-8 sequences are vanishingly unlikely to be
   coherent cp1251/koi8 text).
5. **Cyrillic byte-distribution fallback** — the classic RU-web
   heuristic: in Windows-1251 the lowercase Cyrillic letters occupy
   0xE0–0xFF, in KOI8-R they occupy 0xC0–0xDF (the two encodings swap
   their case blocks).  Real text is lowercase-dominated, so whichever
   range carries more bytes names the charset; ties break to
   Windows-1251 (the more common encoding on the RU web).

Transcoding decodes STRICTLY — a byte the declared charset cannot
represent raises ``ValueError``, so one mislabeled page costs one
record, never silent mojibake in the corpus.
"""

from __future__ import annotations

import codecs
import re

# canonical label -> python codec
_CODECS = {
    "utf-8": "utf-8",
    "utf-16-le": "utf-16-le",
    "utf-16-be": "utf-16-be",
    "windows-1251": "cp1251",
    "koi8-r": "koi8_r",
    "iso-8859-1": "latin-1",
    "us-ascii": "ascii",
}

_ALIASES = {
    "utf8": "utf-8",
    "cp1251": "windows-1251",
    "win-1251": "windows-1251",
    "windows1251": "windows-1251",
    "koi8r": "koi8-r",
    "koi8": "koi8-r",
    "latin-1": "iso-8859-1",
    "latin1": "iso-8859-1",
    "ascii": "us-ascii",
}

_BOMS = (
    (codecs.BOM_UTF8, "utf-8"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)

_CT_CHARSET = re.compile(r"charset\s*=\s*\"?([A-Za-z0-9_\-]+)\"?", re.I)
# prescan patterns over raw bytes (ASCII-superset safe)
_META_CHARSET = re.compile(
    rb"<meta\s[^>]*charset\s*=\s*[\"']?([A-Za-z0-9_\-]+)", re.I
)


def canonical_charset(label: str) -> str:
    """Normalize a charset label to its canonical name; unknown labels
    raise (an unknown declared charset is a quarantine, not a guess)."""
    lab = label.strip().lower()
    lab = _ALIASES.get(lab, lab)
    if lab not in _CODECS:
        raise ValueError(f"charset: unknown label {label!r}")
    return lab


def detect_charset(body: bytes, http_content_type: str | None = None) -> tuple:
    """Detect the charset of crawled page bytes.  Returns
    ``(charset, method)`` where method names the winning evidence tier:
    'bom' | 'http' | 'meta' | 'utf-8-valid' | 'heuristic'."""
    for bom, cs in _BOMS:
        if body.startswith(bom):
            return cs, "bom"
    if http_content_type:
        m = _CT_CHARSET.search(http_content_type)
        if m:
            return canonical_charset(m.group(1)), "http"
    head = body[:1024]
    m = _META_CHARSET.search(head)
    if m:
        return canonical_charset(m.group(1).decode("ascii")), "meta"
    try:
        body.decode("utf-8")
        return "utf-8", "utf-8-valid"
    except UnicodeDecodeError:
        pass
    lower_koi8 = sum(1 for b in body if 0xC0 <= b <= 0xDF)
    lower_1251 = sum(1 for b in body if 0xE0 <= b)
    if lower_1251 >= lower_koi8:
        return "windows-1251", "heuristic"
    return "koi8-r", "heuristic"


def transcode_to_text(body: bytes, charset: str) -> str:
    """Decode page bytes as ``charset`` (canonical label), STRICT: an
    undecodable byte raises ValueError.  A leading BOM matching the
    charset is consumed (it is a mark, not content)."""
    codec = _CODECS.get(charset)
    if codec is None:
        raise ValueError(f"charset: unknown label {charset!r}")
    for bom, cs in _BOMS:
        if cs == charset and body.startswith(bom):
            body = body[len(bom):]
            break
    try:
        return body.decode(codec)
    except UnicodeDecodeError as exc:
        raise ValueError(f"charset: body is not valid {charset}: {exc}") from None
