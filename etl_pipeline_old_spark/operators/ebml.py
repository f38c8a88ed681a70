"""EBML / Matroska / WebM container probe — pure stdlib.

Written from the public specs: RFC 8794 (EBML structure: variable-length
element IDs and sizes, the document-type header) and the Matroska/WebM
element registry (Segment, Info/TimestampScale/Duration, Tracks and the
per-track TrackType/CodecID/Video/Audio metadata, Cluster/Timestamp).

Why this exists: WebM/MKV is the crawled-video container next to ISO
BMFF — completing the engine's container trio (MP4: operators/mp4.py,
Ogg: operators/ogg.py, EBML: here).  Codec payloads (VP9/AV1/Opus)
genuinely need external decoders — the documented seam — but the
dispatch questions a 100 TB video pipeline asks first (which codecs?
what duration? how many tracks/clusters? is the file structurally
sound?) are pure container reads:

- ``read_vint`` / ``walk_ebml``: the RFC 8794 variable-length integer
  forms for IDs (marker bit kept) and sizes (marker bit stripped,
  unknown-size ``all-ones`` handled for Segment the way live-muxed
  files ship), with loud truncation.
- ``build_webm``: a structurally-valid writer (EBML header with
  DocType, Segment with Info/Tracks/Clusters) so staged corpora are
  genuine EBML and the probe is testable both directions.
- ``probe_webm``: doc type + version, timestamp scale, duration in
  milliseconds, per-track (type, codec id, video dims / audio rate and
  channels), cluster count, and SimpleBlock count — the metadata a
  corpus filter runs on before shipping payloads to a codec fleet.
"""

from __future__ import annotations

import struct

# Matroska/WebM element IDs (public registry), as raw ID-form integers
EBML_HDR = 0x1A45DFA3
E_DOCTYPE = 0x4282
E_DOCTYPE_VER = 0x4287
SEGMENT = 0x18538067
INFO = 0x1549A966
E_TS_SCALE = 0x2AD7B1
E_DURATION = 0x4489
TRACKS = 0x1654AE6B
TRACK_ENTRY = 0xAE
E_TRACK_TYPE = 0x83
E_CODEC_ID = 0x86
VIDEO = 0xE0
E_PIXEL_W = 0xB0
E_PIXEL_H = 0xBA
AUDIO = 0xE1
E_SAMP_FREQ = 0xB5
E_CHANNELS = 0x9F
CLUSTER = 0x1F43B675
E_CLUSTER_TS = 0xE7
SIMPLE_BLOCK = 0xA3

_MASTERS = {SEGMENT, INFO, TRACKS, TRACK_ENTRY, VIDEO, AUDIO, CLUSTER, EBML_HDR}


def read_vint(buf: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """RFC 8794 variable-length integer.  IDs keep the length-marker bit
    (``keep_marker=True``); sizes strip it.  Returns (value, new_pos);
    an all-ones size value means 'unknown size'."""
    if pos >= len(buf):
        raise ValueError("ebml: vint at end of data")
    first = buf[pos]
    if first == 0:
        raise ValueError("ebml: invalid vint leading byte 0x00")
    length = 1
    mask = 0x80
    while not (first & mask):
        length += 1
        mask >>= 1
    if pos + length > len(buf):
        raise ValueError("ebml: truncated vint")
    if keep_marker:
        v = 0
        for b in buf[pos : pos + length]:
            v = (v << 8) | b
    else:
        v = first & (mask - 1)
        for b in buf[pos + 1 : pos + length]:
            v = (v << 8) | b
        if v == (1 << (7 * length)) - 1:
            v = -1  # unknown size
    return v, pos + length


def walk_ebml(buf: bytes, start: int, end: int):
    """Yield ``(element_id, body_start, body_end)``; unknown-size elements
    (live-muxing Segment convention) extend to the enclosing end."""
    pos = start
    while pos < end:
        eid, pos = read_vint(buf, pos, keep_marker=True)
        size, pos = read_vint(buf, pos, keep_marker=False)
        if size == -1:
            yield eid, pos, end
            return
        if pos + size > end:
            raise ValueError(f"ebml: element 0x{eid:X} runs past end")
        yield eid, pos, pos + size
        pos += size


def _uint(buf: bytes, b0: int, b1: int) -> int:
    v = 0
    for b in buf[b0:b1]:
        v = (v << 8) | b
    return v


def _float(buf: bytes, b0: int, b1: int) -> float:
    n = b1 - b0
    if n == 4:
        return struct.unpack(">f", buf[b0:b1])[0]
    if n == 8:
        return struct.unpack(">d", buf[b0:b1])[0]
    raise ValueError(f"ebml: float element of width {n}")


# ------------------------------------------------------------------ writer


def _enc_id(eid: int) -> bytes:
    out = []
    v = eid
    while v:
        out.append(v & 0xFF)
        v >>= 8
    return bytes(reversed(out))


def _enc_size(n: int) -> bytes:
    # 4-byte size form: plenty for staged corpora, and exercises the
    # multi-byte size path in the reader
    if n >= (1 << 28) - 1:
        raise ValueError("ebml writer: element too large for 4-byte size")
    return struct.pack(">I", n | (1 << 28))


def _el(eid: int, body: bytes) -> bytes:
    return _enc_id(eid) + _enc_size(len(body)) + body


def _el_uint(eid: int, v: int) -> bytes:
    out = []
    while True:
        out.append(v & 0xFF)
        v >>= 8
        if not v:
            break
    return _el(eid, bytes(reversed(out)))


def build_webm(
    doc_type: str,
    tracks: list,
    clusters: list,
    duration_ms: float,
    ts_scale: int = 1_000_000,
    unknown_segment_size: bool = False,
) -> bytes:
    """Assemble a structurally-valid EBML/WebM stream.  ``tracks`` is a
    list of dicts: {type: 'video'|'audio', codec: str, width, height} or
    {..., rate, channels}.  ``clusters`` is a list of block counts.
    ``unknown_segment_size`` writes the Segment with the all-ones size
    (the live-muxing shape probes must tolerate)."""
    hdr = _el(
        EBML_HDR,
        _el(E_DOCTYPE, doc_type.encode("ascii")) + _el_uint(E_DOCTYPE_VER, 4),
    )
    info = _el(
        INFO,
        _el_uint(E_TS_SCALE, ts_scale)
        + _el(E_DURATION, struct.pack(">d", duration_ms)),
    )
    tr_body = b""
    for i, t in enumerate(tracks):
        entry = _el_uint(E_TRACK_TYPE, 1 if t["type"] == "video" else 2)
        entry += _el(E_CODEC_ID, t["codec"].encode("ascii"))
        if t["type"] == "video":
            entry += _el(
                VIDEO,
                _el_uint(E_PIXEL_W, t["width"]) + _el_uint(E_PIXEL_H, t["height"]),
            )
        else:
            entry += _el(
                AUDIO,
                _el(E_SAMP_FREQ, struct.pack(">f", float(t["rate"])))
                + _el_uint(E_CHANNELS, t["channels"]),
            )
        tr_body += _el(TRACK_ENTRY, entry)
    seg_body = info + _el(TRACKS, tr_body)
    for ci, n_blocks in enumerate(clusters):
        cl = _el_uint(E_CLUSTER_TS, ci * 1000)
        for bi in range(n_blocks):
            # SimpleBlock: track vint(0x81), 2-byte rel ts, flags, payload
            payload = bytes([(ci * 31 + bi * 7 + j) % 256 for j in range(24)])
            cl += _el(
                SIMPLE_BLOCK,
                b"\x81" + struct.pack(">h", bi * 33) + b"\x80" + payload,
            )
        seg_body += _el(CLUSTER, cl)
    if unknown_segment_size:
        # all-ones 4-byte size form
        seg = _enc_id(SEGMENT) + struct.pack(">I", (1 << 29) - 1) + seg_body
    else:
        seg = _el(SEGMENT, seg_body)
    return hdr + seg


# ------------------------------------------------------------------ probe


def probe_webm(payload: bytes) -> dict:
    """Container dispatch metadata: ``doc_type``, ``doc_type_version``,
    ``ts_scale``, ``duration_ms`` (rounded to int), per-track summaries
    (``n_video``/``n_audio``, first video ``width``/``height`` + codec,
    first audio ``rate``/``channels`` + codec), ``n_clusters``,
    ``n_blocks``.  Structural damage raises ``ValueError``."""
    out = {
        "doc_type": "", "doc_type_version": 0, "ts_scale": 1_000_000,
        "duration_ms": 0, "n_video": 0, "n_audio": 0,
        "video_codec": "", "width": 0, "height": 0,
        "audio_codec": "", "rate": 0, "channels": 0,
        "n_clusters": 0, "n_blocks": 0,
    }
    saw_header = saw_segment = False
    for eid, b0, b1 in walk_ebml(payload, 0, len(payload)):
        if eid == EBML_HDR:
            saw_header = True
            for eid2, c0, c1 in walk_ebml(payload, b0, b1):
                if eid2 == E_DOCTYPE:
                    out["doc_type"] = payload[c0:c1].decode("ascii")
                elif eid2 == E_DOCTYPE_VER:
                    out["doc_type_version"] = _uint(payload, c0, c1)
        elif eid == SEGMENT:
            saw_segment = True
            _probe_segment(payload, b0, b1, out)
    if not saw_header or not saw_segment:
        raise ValueError("ebml: missing EBML header or Segment")
    return out


def _probe_segment(payload: bytes, b0: int, b1: int, out: dict) -> None:
    for eid, c0, c1 in walk_ebml(payload, b0, b1):
        if eid == INFO:
            for eid2, d0, d1 in walk_ebml(payload, c0, c1):
                if eid2 == E_TS_SCALE:
                    out["ts_scale"] = _uint(payload, d0, d1)
                elif eid2 == E_DURATION:
                    out["duration_ms"] = round(
                        _float(payload, d0, d1)
                        * out["ts_scale"] / 1_000_000
                    )
        elif eid == TRACKS:
            for eid2, d0, d1 in walk_ebml(payload, c0, c1):
                if eid2 == TRACK_ENTRY:
                    _probe_track(payload, d0, d1, out)
        elif eid == CLUSTER:
            out["n_clusters"] += 1
            for eid2, d0, d1 in walk_ebml(payload, c0, c1):
                if eid2 == SIMPLE_BLOCK:
                    out["n_blocks"] += 1


def _probe_track(payload: bytes, b0: int, b1: int, out: dict) -> None:
    ttype = 0
    codec = ""
    video = audio = None
    for eid, c0, c1 in walk_ebml(payload, b0, b1):
        if eid == E_TRACK_TYPE:
            ttype = _uint(payload, c0, c1)
        elif eid == E_CODEC_ID:
            codec = payload[c0:c1].decode("ascii")
        elif eid == VIDEO:
            video = (c0, c1)
        elif eid == AUDIO:
            audio = (c0, c1)
    if ttype == 1:
        out["n_video"] += 1
        if not out["video_codec"]:
            out["video_codec"] = codec
            for eid, c0, c1 in walk_ebml(payload, *video):
                if eid == E_PIXEL_W:
                    out["width"] = _uint(payload, c0, c1)
                elif eid == E_PIXEL_H:
                    out["height"] = _uint(payload, c0, c1)
    elif ttype == 2:
        out["n_audio"] += 1
        if not out["audio_codec"]:
            out["audio_codec"] = codec
            for eid, c0, c1 in walk_ebml(payload, *audio):
                if eid == E_SAMP_FREQ:
                    out["rate"] = round(_float(payload, c0, c1))
                elif eid == E_CHANNELS:
                    out["channels"] = _uint(payload, c0, c1)
