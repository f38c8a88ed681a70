"""MPEG audio (MP3) frame-walk metadata probe — pure stdlib.

Written from the public MPEG-1/MPEG-2 audio framing layout (ISO/IEC
11172-3 §2.4 / 13818-3) and the de-facto public Xing/Info VBR header and
ID3 tag formats.

Why this exists: full MP3 *decode* (scalefactor/huffman parse, IMDCT,
polyphase synthesis) genuinely belongs to an external codec library — it
stays a documented seam (operators/multimodal.py).  But an audio-corpus
pipeline filters LONG before it decodes: duration, bitrate, sample rate,
mono/stereo, CBR-vs-VBR, tag presence — all derivable from a frame-header
walk that touches four bytes per frame.  At 100 TB this probe is the
cheap first pass that decides which blobs are worth shipping to a codec
at all, the same role the MP4 demuxer plays for ISO BMFF containers.

Surface:
- ``probe_mp3``: skip an ID3v2 preamble (syncsafe length, optional
  footer), walk every frame header (version/layer/bitrate/samplerate/
  padding/channel-mode tables below are the public spec tables), detect
  a leading Xing/Info VBR header at its version/mode-dependent offset,
  tolerate a trailing 128-byte ID3v1 tag, and fail LOUDLY on a broken
  sync anywhere else — a torn file costs its record, never the job.
- ``build_mp3``: emit structurally-valid frame streams (correct headers,
  spec-exact frame lengths, deterministic filler payload) so the probe
  is testable and the ingest query can stage real-shaped files.  This is
  a *framer*, not an encoder — the payload is not decodable audio, which
  is exactly the honest scope: framing is public structure, psychoacoustic
  payload is the codec seam.
"""

from __future__ import annotations

import hashlib
import struct

# bitrate tables, kbps, index 1..14 (0 = free format, 15 = bad) —
# ISO/IEC 11172-3 Table B.2 (MPEG-1 Layer III) and 13818-3 (MPEG-2 LSF)
_BITRATE_V1_L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_BITRATE_V2_L3 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
# sample-rate tables by version bits (00=MPEG2.5, 10=MPEG2, 11=MPEG1)
_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}
_SAMPLES_PER_FRAME = {3: 1152, 2: 576, 0: 576}  # Layer III


def _frame_len(version_bits: int, bitrate_kbps: int, rate: int, padding: int) -> int:
    # Layer III: MPEG-1 uses 144*bps/rate; LSF versions use 72*bps/rate
    coef = 144 if version_bits == 3 else 72
    return coef * bitrate_kbps * 1000 // rate + padding


def _header(
    version_bits: int, bitrate_kbps: int, rate: int, padding: int, mono: bool
) -> bytes:
    table = _BITRATE_V1_L3 if version_bits == 3 else _BITRATE_V2_L3
    br_idx = table.index(bitrate_kbps)
    sr_idx = _RATES[version_bits].index(rate)
    b1 = 0xE0 | (version_bits << 3) | (0b01 << 1) | 1  # sync low, Layer III, no CRC
    b2 = (br_idx << 4) | (sr_idx << 2) | (padding << 1)
    b3 = (0b11 << 6) if mono else 0  # channel mode: single / stereo
    return bytes([0xFF, b1, b2, b3])


def _side_info_len(version_bits: int, mono: bool) -> int:
    if version_bits == 3:
        return 17 if mono else 32
    return 9 if mono else 17


def build_mp3(
    frames: list,
    id3v2_bytes: int = 0,
    xing_frames: int | None = None,
    id3v1: bool = False,
    seed: str = "",
    id3v2_frames: list | None = None,
) -> bytes:
    """Build a structurally-valid Layer III stream.  ``frames`` is a list of
    ``(version_bits, bitrate_kbps, sample_rate, padding, mono)`` tuples.
    ``xing_frames`` (if set) prepends a Xing-tagged frame matching frame 0's
    shape and declaring that many data frames.  Filler bytes are an md5
    stream keyed on ``seed`` so staged files are not zero padding."""
    out = bytearray()
    if id3v2_frames is not None:
        body = b"".join(
            _id3_frame(fid, text) for fid, text in id3v2_frames
        )
        if id3v2_bytes > len(body):  # spec-legal zero padding
            body += b"\x00" * (id3v2_bytes - len(body))
        out += b"ID3" + bytes([4, 0, 0]) + _syncsafe(len(body)) + body
    elif id3v2_bytes:
        out += b"ID3" + bytes([4, 0, 0]) + _syncsafe(id3v2_bytes)
        out += _fill(id3v2_bytes, seed + ":id3")
    stream = list(frames)
    if xing_frames is not None:
        stream = [frames[0]] + stream
    for i, (ver, br, rate, pad, mono) in enumerate(stream):
        hdr = _header(ver, br, rate, pad, mono)
        flen = _frame_len(ver, br, rate, pad)
        body = bytearray(_fill(flen - 4, f"{seed}:{i}"))
        if xing_frames is not None and i == 0:
            off = _side_info_len(ver, mono)
            body[:off] = b"\x00" * off
            tag = b"Xing" + struct.pack(">II", 0x1, xing_frames)
            body[off : off + len(tag)] = tag
        out += hdr + bytes(body)
    if id3v1:
        out += b"TAG" + _fill(125, seed + ":v1")
    return bytes(out)


def _fill(n: int, key: str) -> bytes:
    out = bytearray()
    k = 0
    while len(out) < n:
        chunk = hashlib.md5(f"{key}:{k}".encode()).digest()
        # keep filler sync-free: MP3 has no byte stuffing, so a 0xFF in
        # padding could alias a frame sync; the walk is length-directed so
        # it would not misparse, but honest filler avoids fake syncs too
        out += bytes(b & 0x7F for b in chunk)
        k += 1
    return bytes(out[:n])


def probe_mp3(payload: bytes) -> dict:
    """Frame-walk the stream and return its corpus-filter metadata:

    ``n_frames`` (data frames, Xing frame excluded), ``rate``, ``version``
    (1/2 — 2.5 reports 2 with ``rate`` disambiguating), ``mono``,
    ``duration_ms`` (floor, from samples-per-frame × frames / rate),
    ``bitrate_kbps_sum`` (over data frames — exact integer, so CBR mean
    and VBR detection are both derivable), ``is_vbr`` (Xing tag present
    or >1 distinct data-frame bitrate), ``xing_frames`` (-1 when absent),
    ``has_id3v2``, ``has_id3v1``.  Raises ``ValueError`` on a broken sync
    or truncated frame — corruption is loud."""
    pos = 0
    has_id3v2 = 0
    if payload[:3] == b"ID3":
        if len(payload) < 10:
            raise ValueError("mp3: truncated ID3v2 header")
        sz = 0
        for b in payload[6:10]:
            if b & 0x80:
                raise ValueError("mp3: ID3v2 size byte not syncsafe")
            sz = (sz << 7) | b
        pos = 10 + sz + (10 if payload[5] & 0x10 else 0)
        has_id3v2 = 1
    end = len(payload)
    has_id3v1 = 0
    if end - pos >= 128 and payload[end - 128 : end - 125] == b"TAG":
        end -= 128
        has_id3v1 = 1
    n = 0
    rate = version_bits = -1
    mono = 0
    bitrates: list[int] = []
    xing_frames = -1
    vbr_tag = 0  # "Xing" declares VBR; "Info" declares CBR
    first = True
    while pos < end:
        if pos + 4 > end:
            raise ValueError("mp3: truncated frame header")
        b0, b1, b2, b3 = payload[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"mp3: broken frame sync at byte {pos}")
        vb = (b1 >> 3) & 0x3
        layer = (b1 >> 1) & 0x3
        if vb == 1 or layer != 0b01:
            raise ValueError("mp3: reserved version or non-Layer-III frame")
        br_idx = b2 >> 4
        sr_idx = (b2 >> 2) & 0x3
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError("mp3: free-format or reserved bitrate/samplerate")
        table = _BITRATE_V1_L3 if vb == 3 else _BITRATE_V2_L3
        br = table[br_idx]
        rt = _RATES[vb][sr_idx]
        pad = (b2 >> 1) & 1
        is_mono = (b3 >> 6) == 0b11
        if first:
            version_bits, rate, mono = vb, rt, 1 if is_mono else 0
            first = False
        elif (vb, rt) != (version_bits, rate):
            raise ValueError("mp3: version/samplerate change mid-stream")
        flen = _frame_len(vb, br, rt, pad)
        if pos + flen > end:
            raise ValueError("mp3: frame runs past end of stream")
        if n == 0 and xing_frames < 0:
            off = pos + 4 + _side_info_len(vb, is_mono)
            tag = payload[off : off + 4]
            if tag in (b"Xing", b"Info"):
                vbr_tag = 1 if tag == b"Xing" else 0
                flags = struct.unpack(">I", payload[off + 4 : off + 8])[0]
                if flags & 0x1:
                    xing_frames = struct.unpack(
                        ">I", payload[off + 8 : off + 12]
                    )[0]
                else:
                    xing_frames = 0
                pos += flen  # the tag frame is not a data frame
                continue
        bitrates.append(br)
        n += 1
        pos += flen
    if n == 0:
        raise ValueError("mp3: no audio frames")
    spf = _SAMPLES_PER_FRAME[version_bits]
    return {
        "n_frames": n,
        "rate": rate,
        "version": 1 if version_bits == 3 else 2,
        "mono": mono,
        "duration_ms": n * spf * 1000 // rate,
        "bitrate_kbps_sum": sum(bitrates),
        "is_vbr": 1 if (vbr_tag or len(set(bitrates)) > 1) else 0,
        "xing_frames": xing_frames,
        "has_id3v2": has_id3v2,
        "has_id3v1": has_id3v1,
    }


# -------------------------------------------------------- ID3v2.4 frames
# The MP3 twin of the Ogg family's VorbisComment layer (informal ID3v2.4
# spec, id3.org): TIT2/TPE1/TLAN text frames are where a speech/music
# corpus's join keys ride.  Frame sizes are syncsafe in v2.4; text
# frames carry an encoding byte (0 latin-1, 1 UTF-16+BOM, 2 UTF-16BE,
# 3 UTF-8).


def _syncsafe(n: int) -> bytes:
    if n >= 1 << 28:
        raise ValueError("mp3: size too large for syncsafe encoding")
    return bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )


def _unsyncsafe(b: bytes) -> int:
    if any(x & 0x80 for x in b):
        raise ValueError("mp3: ID3v2 size byte not syncsafe")
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _id3_frame(frame_id: str, text: str) -> bytes:
    fid = frame_id.encode("ascii")
    if len(fid) != 4 or not frame_id.startswith("T"):
        raise ValueError(f"mp3: not a text frame id {frame_id!r}")
    body = b"\x03" + text.encode("utf-8")  # encoding 3 = UTF-8
    return fid + _syncsafe(len(body)) + b"\x00\x00" + body


_ID3_ENCODINGS = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}


def parse_id3v2(payload: bytes) -> list:
    """Parse the leading ID3v2.4 tag's TEXT frames into
    ``[(frame_id, text)]``.  Stops at the padding region; truncated
    frames, non-syncsafe sizes, and unknown text encodings raise; a
    stream without an ID3v2 tag raises."""
    if payload[:3] != b"ID3":
        raise ValueError("mp3: no ID3v2 tag")
    if len(payload) < 10:
        raise ValueError("mp3: truncated ID3v2 header")
    major = payload[3]
    size = _unsyncsafe(payload[6:10])
    if 10 + size > len(payload):
        raise ValueError("mp3: ID3v2 tag runs past end")
    tag = payload[10 : 10 + size]
    out = []
    pos = 0
    while pos + 10 <= len(tag):
        if tag[pos] == 0:  # padding region
            break
        fid = tag[pos : pos + 4]
        if not all(0x30 <= c <= 0x5A for c in fid):
            raise ValueError(f"mp3: bad ID3v2 frame id {fid!r}")
        fsize = (
            _unsyncsafe(tag[pos + 4 : pos + 8])
            if major >= 4
            else int.from_bytes(tag[pos + 4 : pos + 8], "big")
        )
        body = tag[pos + 10 : pos + 10 + fsize]
        if len(body) != fsize:
            raise ValueError("mp3: ID3v2 frame truncated")
        if fid[:1] == b"T" and fsize >= 1:
            enc = _ID3_ENCODINGS.get(body[0])
            if enc is None:
                raise ValueError(f"mp3: unknown text encoding {body[0]}")
            out.append(
                (fid.decode("ascii"), body[1:].decode(enc).rstrip("\x00"))
            )
        pos += 10 + fsize
    return out
