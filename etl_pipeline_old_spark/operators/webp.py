"""WebP container probe (RIFF layout, public container spec) — pure
stdlib.  WebP is the second-most-common image format in modern web
crawls after JPEG; the filter-before-decode pass needs its dimensions,
feature flags, and frame structure WITHOUT a VP8 entropy decoder:

- **RIFF framing**: ``RIFF <size> WEBP`` then even-padded chunks.
- **VP8 `` (lossy)**: the frame tag (keyframe bit, profile, show bit,
  first-partition size), the 3-byte start code 9D 01 2A, and 14-bit
  width/height with scaling bits (public VP8 spec / RFC 6386 §9.1).
- **VP8L** (lossless): the 0x2F signature and the packed 14-bit
  width-1/height-1, alpha-hint and version bits.
- **VP8X** (extended): the feature-flag byte (ICC/alpha/EXIF/XMP/
  animation) and 24-bit canvas width-1/height-1; ANIM (background
  color + loop count) and per-frame ANMF headers (frame x/y 2×,
  width-1/height-1, duration, blend/dispose bits) for animations.

Payload decode (VP8 boolean-arithmetic entropy, VP8L huffman) stays the
documented loud seam — the probe is the corpus routing/filter pass, the
decode fleet plugs a codec into the extracted payloads."""

from __future__ import annotations

import struct


def decode_webp(_payload: bytes) -> list:
    """The documented seam."""
    raise NotImplementedError(
        "webp: VP8/VP8L payload decode needs an external codec — "
        "probe_webp extracts the routing metadata"
    )


def _chunks(blob: bytes):
    if blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        raise ValueError("webp: not a RIFF/WEBP container")
    (riff_size,) = struct.unpack_from("<I", blob, 4)
    end = 8 + riff_size
    if end > len(blob):
        raise ValueError("webp: RIFF size runs past end")
    i = 12
    while i + 8 <= end:
        fourcc = blob[i : i + 4]
        (size,) = struct.unpack_from("<I", blob, i + 4)
        payload = blob[i + 8 : i + 8 + size]
        if len(payload) != size:
            raise ValueError(f"webp: chunk {fourcc!r} truncated")
        yield fourcc, payload
        i += 8 + size + (size & 1)  # chunks are even-padded


def _vp8_dims(p: bytes) -> tuple:
    if len(p) < 10:
        raise ValueError("webp: VP8 chunk too short")
    tag = p[0] | (p[1] << 8) | (p[2] << 16)
    if tag & 0x1:
        raise ValueError("webp: VP8 chunk is not a key frame")
    if p[3:6] != b"\x9d\x01\x2a":
        raise ValueError("webp: bad VP8 start code")
    w = struct.unpack_from("<H", p, 6)[0] & 0x3FFF
    h = struct.unpack_from("<H", p, 8)[0] & 0x3FFF
    return w, h


def _vp8l_dims(p: bytes) -> tuple:
    if len(p) < 5 or p[0] != 0x2F:
        raise ValueError("webp: bad VP8L signature")
    bits = struct.unpack_from("<I", p, 1)[0]
    w = (bits & 0x3FFF) + 1
    h = ((bits >> 14) & 0x3FFF) + 1
    alpha = (bits >> 28) & 0x1
    version = (bits >> 29) & 0x7
    if version != 0:
        raise ValueError(f"webp: VP8L version {version} is reserved")
    return w, h, alpha


def probe_webp(blob: bytes) -> dict:
    """Route-level metadata for one WebP blob: ``fmt`` ('vp8' | 'vp8l' |
    'vp8x'), canvas ``width``/``height``, ``has_alpha``, ``animated``,
    ``n_frames`` (1 for stills), ``sum_duration_ms``, ``loop_count``.
    Structural damage raises per record."""
    out = {
        "fmt": None, "width": 0, "height": 0, "has_alpha": 0,
        "animated": 0, "n_frames": 0, "sum_duration_ms": 0, "loop_count": 0,
    }
    for fourcc, p in _chunks(blob):
        if fourcc == b"VP8X":
            if len(p) < 10:
                raise ValueError("webp: VP8X chunk too short")
            flags = p[0]
            out["fmt"] = "vp8x"
            out["has_alpha"] = (flags >> 4) & 0x1
            out["animated"] = (flags >> 1) & 0x1
            out["width"] = 1 + int.from_bytes(p[4:7], "little")
            out["height"] = 1 + int.from_bytes(p[7:10], "little")
        elif fourcc == b"ANIM":
            if len(p) < 6:
                raise ValueError("webp: ANIM chunk too short")
            out["loop_count"] = struct.unpack_from("<H", p, 4)[0]
        elif fourcc == b"ANMF":
            if len(p) < 16:
                raise ValueError("webp: ANMF header too short")
            out["n_frames"] += 1
            out["sum_duration_ms"] += int.from_bytes(p[12:15], "little")
        elif fourcc == b"VP8 " and out["fmt"] is None:
            w, h = _vp8_dims(p)
            out["fmt"], out["width"], out["height"] = "vp8", w, h
            out["n_frames"] = 1
        elif fourcc == b"VP8L" and out["fmt"] is None:
            w, h, alpha = _vp8l_dims(p)
            out["fmt"], out["width"], out["height"] = "vp8l", w, h
            out["has_alpha"] = alpha
            out["n_frames"] = 1
    if out["fmt"] is None:
        raise ValueError("webp: no image chunk (VP8/VP8L/VP8X) present")
    if out["fmt"] == "vp8x" and not out["animated"] and out["n_frames"] == 0:
        out["n_frames"] = 1
    return out


# ------------------------------------------------------------------ writer


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _riff(chunks: bytes) -> bytes:
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks


def encode_webp_vp8_still(width: int, height: int, filler: bytes = b"") -> bytes:
    """A structurally valid lossy-WebP container: correct RIFF framing,
    VP8 key-frame tag + start code + 14-bit dims; the entropy payload is
    opaque filler (this writer exists to exercise the PROBE path)."""
    if not (0 < width < 1 << 14 and 0 < height < 1 << 14):
        raise ValueError("webp: dims out of 14-bit range")
    tag = (0 << 0) | (3 << 1) | (1 << 4) | (64 << 5)  # key, profile 3, shown
    head = bytes(
        [tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF]
    ) + b"\x9d\x01\x2a" + struct.pack("<HH", width, height)
    return _riff(_chunk(b"VP8 ", head + filler))


def encode_webp_vp8l_still(
    width: int, height: int, alpha: bool = False, filler: bytes = b""
) -> bytes:
    """A structurally valid lossless-WebP container (VP8L signature +
    packed dims/alpha/version); payload is opaque filler."""
    if not (0 < width <= 1 << 14 and 0 < height <= 1 << 14):
        raise ValueError("webp: dims out of 14-bit range")
    bits = (width - 1) | ((height - 1) << 14) | ((1 if alpha else 0) << 28)
    return _riff(_chunk(b"VP8L", bytes([0x2F]) + struct.pack("<I", bits) + filler))


def encode_webp_animation(
    width: int, height: int, frames: list, loop_count: int = 0
) -> bytes:
    """An extended (VP8X + ANIM + ANMF…) animated WebP: ``frames`` is
    ``[(duration_ms, payload_filler)]``; each frame is a full-canvas
    ANMF wrapping an opaque VP8 key-frame header."""
    flags = (1 << 1) | (1 << 4)  # animation + alpha-capable canvas
    vp8x = _chunk(
        b"VP8X",
        bytes([flags, 0, 0, 0])
        + (width - 1).to_bytes(3, "little")
        + (height - 1).to_bytes(3, "little"),
    )
    anim = _chunk(b"ANIM", struct.pack("<IH", 0xFF000000, loop_count))
    body = vp8x + anim
    for duration_ms, filler in frames:
        sub = encode_webp_vp8_still(width, height, filler)[12:]  # inner chunk
        anmf = (
            (0).to_bytes(3, "little") + (0).to_bytes(3, "little")
            + (width - 1).to_bytes(3, "little")
            + (height - 1).to_bytes(3, "little")
            + int(duration_ms).to_bytes(3, "little")
            + bytes([0])  # blend over, keep-in-place dispose
            + sub
        )
        body += _chunk(b"ANMF", anmf)
    return _riff(body)
