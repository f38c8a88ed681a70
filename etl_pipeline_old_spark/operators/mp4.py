"""ISO Base Media File Format (MP4) container codec — pure stdlib.

Written from the public specs: ISO/IEC 14496-12 (box structure, movie and
track boxes, sample tables, movie fragments) and ISO/IEC 23003-5 (raw PCM
in ISO BMFF: the ``ipcm`` sample entry and its ``pcmC`` configuration box).

Why this exists: the engine's crawl-ingest path treats MP4 as a codec seam
(operators/multimodal.py) because decoding AVC/AAC payloads genuinely needs
external codec libraries.  But a 100 TB video/audio corpus pipeline does a
LOT of work before any codec runs — duration/track/codec filtering, sample
extraction for downstream decoders, fragment (CMAF/DASH) reassembly — and
all of that is CONTAINER work, fully tractable from the public spec.  This
module is that demux layer:

- ``walk_boxes`` / ``parse_mp4``: generic box walker (32-bit and 64-bit
  ``largesize`` forms, unknown-box skip as the spec requires) producing the
  movie header, per-track metadata (handler, codec fourcc, timescale,
  duration, channel/rate for audio sample entries) and the flat sample
  tables (stts/stsc/stsz/stco|co64).
- ``extract_samples``: resolves the stsc/stco/stsz indirection into per-
  sample byte ranges — the exact algorithm 14496-12 §8.7 prescribes — and
  also reassembles movie fragments (moof/tfhd/trun with the
  ``default-base-is-moof`` convention CMAF uses).
- ``encode_mp4_pcm`` / ``decode_mp4_pcm``: a real, openable PCM-in-MP4
  muxer and its inverse.  PCM is the one payload the spec itself defines
  bit-exactly (23003-5), which lets the oracle demand EXACT sample
  recovery the same way the FLAC ingest does; compressed payloads stay
  behind the documented NotImplementedError seam.

Reference parity note: the reference pipeline has no media path at all —
this belongs to the beyond-reference LLM-data mandate (multimodal corpus
plumbing, SURVEY.md §2 "multimodal columns").

Torn-file posture: a box whose declared size runs past the end of the blob
raises ``ValueError`` ("box runs past end") — corruption is loud, one file
costs one record inside the ingest quarantine pattern, never the job.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

_FULLBOX_CONTAINERS = frozenset(
    {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"dinf",
     b"udta", b"moof", b"traf", b"mvex"}
)


# --------------------------------------------------------------- box walk


def walk_boxes(buf: bytes, start: int = 0, end: int | None = None):
    """Yield ``(fourcc, header_size, body_start, body_end)`` for each box in
    ``buf[start:end]``.  Handles ``size==1`` (64-bit largesize) and
    ``size==0`` (box extends to end of enclosing scope) per 14496-12 §4.2.
    Raises on a box that runs past its scope — truncation is loud."""
    if end is None:
        end = len(buf)
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("mp4: box header runs past end")
        size = struct.unpack_from(">I", buf, pos)[0]
        fourcc = buf[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("mp4: largesize header runs past end")
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"mp4: box {fourcc!r} runs past end")
        yield fourcc, hdr, pos + hdr, pos + size
        pos += size


def _find(buf: bytes, start: int, end: int, fourcc: bytes):
    for fc, _h, b0, b1 in walk_boxes(buf, start, end):
        if fc == fourcc:
            return b0, b1
    return None


# ------------------------------------------------------------ parsed model


@dataclass
class SampleEntry:
    codec: str  # sample-entry fourcc, e.g. "ipcm", "avc1", "mp4a"
    channels: int = 0
    sample_rate: int = 0
    sample_size_bits: int = 0
    pcm_big_endian: bool = True
    # mp4a only: the esds AudioSpecificConfig parameters (operators/aac.py)
    # — aot/sample_rate/channels/frame_length/object_type/avg_bitrate.
    # Probing these is metadata; PAYLOAD decode stays the documented seam.
    aac: dict | None = None


@dataclass
class Track:
    track_id: int
    handler: str  # 'soun', 'vide', ...
    timescale: int
    duration: int
    entry: SampleEntry
    # flat sample tables (empty for fragmented tracks)
    stts: list = field(default_factory=list)  # [(count, delta)]
    stsc: list = field(default_factory=list)  # [(first_chunk, per_chunk, desc_idx)]
    sample_sizes: list = field(default_factory=list)  # [] if constant
    constant_size: int = 0
    chunk_offsets: list = field(default_factory=list)

    @property
    def n_samples(self) -> int:
        return sum(c for c, _d in self.stts)


@dataclass
class Fragment:
    track_id: int
    base_offset: int  # resolved data base (moof start under CMAF convention)
    data_offset: int  # trun data offset relative to base
    sample_sizes: list


@dataclass
class Movie:
    brand: str
    timescale: int
    duration: int
    tracks: list
    fragments: list
    fragmented: bool


def _parse_sample_entry(buf: bytes, b0: int, b1: int) -> SampleEntry:
    """stsd body: version/flags + entry_count, then sample entries.  Audio
    sample entry layout per 14496-12 §12.2.3; ``ipcm`` carries a ``pcmC``
    child (23003-5 §4.2) naming endianness and sample size."""
    entry_count = struct.unpack_from(">I", buf, b0 + 4)[0]
    if entry_count < 1:
        raise ValueError("mp4: stsd with no sample entries")
    for fc, _h, e0, e1 in walk_boxes(buf, b0 + 8, b1):
        entry = SampleEntry(codec=fc.decode("latin-1"))
        if fc in (b"ipcm", b"fpcm", b"mp4a", b"sowt", b"twos", b"lpcm"):
            # SampleEntry: 6 reserved + data_reference_index(2); then
            # AudioSampleEntry: 8 reserved, channelcount(2), samplesize(2),
            # pre_defined(2), reserved(2), samplerate(4, 16.16 fixed)
            entry.channels = struct.unpack_from(">H", buf, e0 + 16)[0]
            entry.sample_size_bits = struct.unpack_from(">H", buf, e0 + 18)[0]
            entry.sample_rate = struct.unpack_from(">I", buf, e0 + 24)[0] >> 16
            pc = _find(buf, e0 + 28, e1, b"pcmC")
            if pc is not None:
                # pcmC: FullBox(version,flags) + format_flags(1) + PCM_sample_size(1)
                fmt_flags = buf[pc[0] + 4]
                entry.pcm_big_endian = not (fmt_flags & 0x01)
                entry.sample_size_bits = buf[pc[0] + 5]
            if fc == b"mp4a":
                es = _find(buf, e0 + 28, e1, b"esds")
                if es is not None:
                    from .aac import parse_esds

                    entry.aac = parse_esds(buf[es[0] : es[1]])
        return entry
    raise ValueError("mp4: empty stsd")


def _parse_stbl(buf: bytes, b0: int, b1: int, tr: Track) -> None:
    for fc, _h, c0, c1 in walk_boxes(buf, b0, b1):
        if fc == b"stsd":
            tr.entry = _parse_sample_entry(buf, c0, c1)
        elif fc == b"stts":
            n = struct.unpack_from(">I", buf, c0 + 4)[0]
            tr.stts = [
                struct.unpack_from(">II", buf, c0 + 8 + 8 * i) for i in range(n)
            ]
        elif fc == b"stsc":
            n = struct.unpack_from(">I", buf, c0 + 4)[0]
            tr.stsc = [
                struct.unpack_from(">III", buf, c0 + 8 + 12 * i) for i in range(n)
            ]
        elif fc == b"stsz":
            tr.constant_size = struct.unpack_from(">I", buf, c0 + 4)[0]
            n = struct.unpack_from(">I", buf, c0 + 8)[0]
            if tr.constant_size == 0:
                tr.sample_sizes = [
                    struct.unpack_from(">I", buf, c0 + 12 + 4 * i)[0]
                    for i in range(n)
                ]
        elif fc == b"stco":
            n = struct.unpack_from(">I", buf, c0 + 4)[0]
            tr.chunk_offsets = [
                struct.unpack_from(">I", buf, c0 + 8 + 4 * i)[0] for i in range(n)
            ]
        elif fc == b"co64":
            n = struct.unpack_from(">I", buf, c0 + 4)[0]
            tr.chunk_offsets = [
                struct.unpack_from(">Q", buf, c0 + 8 + 8 * i)[0] for i in range(n)
            ]


def _parse_trak(buf: bytes, b0: int, b1: int) -> Track:
    track_id = 0
    handler = ""
    timescale = 0
    duration = 0
    entry = SampleEntry(codec="")
    tr = Track(0, "", 0, 0, entry)
    for fc, _h, c0, c1 in walk_boxes(buf, b0, b1):
        if fc == b"tkhd":
            ver = buf[c0]
            # v0: creation(4) mod(4) id(4); v1: creation(8) mod(8) id(4)
            track_id = struct.unpack_from(
                ">I", buf, c0 + (4 + 16 if ver else 4 + 8)
            )[0]
        elif fc == b"mdia":
            for fc2, _h2, d0, d1 in walk_boxes(buf, c0, c1):
                if fc2 == b"mdhd":
                    ver = buf[d0]
                    off = d0 + (4 + 16 if ver else 4 + 8)
                    timescale = struct.unpack_from(">I", buf, off)[0]
                    duration = (
                        struct.unpack_from(">Q", buf, off + 4)[0]
                        if ver
                        else struct.unpack_from(">I", buf, off + 4)[0]
                    )
                elif fc2 == b"hdlr":
                    handler = buf[d0 + 8 : d0 + 12].decode("latin-1")
                elif fc2 == b"minf":
                    st = _find(buf, d0, d1, b"stbl")
                    if st is not None:
                        _parse_stbl(buf, st[0], st[1], tr)
    tr.track_id, tr.handler, tr.timescale, tr.duration = (
        track_id, handler, timescale, duration,
    )
    return tr


def _parse_moof(buf: bytes, b0: int, b1: int, moof_start: int) -> list:
    frags = []
    traf_idx = 0
    for fc, _h, c0, c1 in walk_boxes(buf, b0, b1):
        if fc != b"traf":
            continue
        traf_idx += 1
        track_id = 0
        base = moof_start
        default_size = 0
        for fc2, _h2, d0, d1 in walk_boxes(buf, c0, c1):
            if fc2 == b"tfhd":
                flags = int.from_bytes(buf[d0 + 1 : d0 + 4], "big")
                track_id = struct.unpack_from(">I", buf, d0 + 4)[0]
                p = d0 + 8
                if flags & 0x000001:  # base-data-offset present
                    base = struct.unpack_from(">Q", buf, p)[0]
                    p += 8
                elif not flags & 0x020000 and traf_idx > 1:
                    # neither explicit base nor default-base-is-moof: per
                    # 14496-12 §8.8.7 a 2nd+ traf inherits end-of-previous
                    # -run — an offset convention we do not track; wrong
                    # bytes would be extracted silently, so refuse loudly.
                    # (For the FIRST traf the spec default IS moof start.)
                    raise ValueError(
                        "mp4: traf base-data-offset inheritance from the "
                        "previous run is not supported (set "
                        "default-base-is-moof or an explicit base)"
                    )
                if flags & 0x000002:  # sample-description-index
                    p += 4
                if flags & 0x000008:  # default-sample-duration
                    p += 4
                if flags & 0x000010:  # default-sample-size
                    default_size = struct.unpack_from(">I", buf, p)[0]
                    p += 4
            elif fc2 == b"trun":
                flags = int.from_bytes(buf[d0 + 1 : d0 + 4], "big")
                n = struct.unpack_from(">I", buf, d0 + 4)[0]
                p = d0 + 8
                data_off = 0
                if flags & 0x000001:
                    data_off = struct.unpack_from(">i", buf, p)[0]
                    p += 4
                if flags & 0x000004:  # first-sample-flags
                    p += 4
                sizes = []
                per = 0
                per += 4 if flags & 0x000100 else 0  # sample-duration
                has_size = bool(flags & 0x000200)
                for _i in range(n):
                    q = p
                    if flags & 0x000100:
                        q += 4
                    if has_size:
                        sizes.append(struct.unpack_from(">I", buf, q)[0])
                        q += 4
                    if flags & 0x000400:  # sample-flags
                        q += 4
                    if flags & 0x000800:  # composition offset
                        q += 4
                    p = q
                if not has_size:
                    sizes = [default_size] * n
                frags.append(Fragment(track_id, base, data_off, sizes))
    return frags


def parse_mp4(buf: bytes) -> Movie:
    """Demux the container: brands, movie header, tracks (metadata + flat
    sample tables), and movie fragments.  Unknown boxes are skipped, as the
    spec requires of readers; structural damage raises."""
    brand = ""
    timescale = duration = 0
    tracks: list[Track] = []
    fragments: list[Fragment] = []
    saw_moov = False
    for fc, _h, b0, b1 in walk_boxes(buf):
        if fc == b"ftyp":
            brand = buf[b0 : b0 + 4].decode("latin-1")
        elif fc == b"moov":
            saw_moov = True
            for fc2, _h2, c0, c1 in walk_boxes(buf, b0, b1):
                if fc2 == b"mvhd":
                    ver = buf[c0]
                    off = c0 + (4 + 16 if ver else 4 + 8)
                    timescale = struct.unpack_from(">I", buf, off)[0]
                    duration = (
                        struct.unpack_from(">Q", buf, off + 4)[0]
                        if ver
                        else struct.unpack_from(">I", buf, off + 4)[0]
                    )
                elif fc2 == b"trak":
                    tracks.append(_parse_trak(buf, c0, c1))
        elif fc == b"moof":
            # moof start = payload start minus the ACTUAL header size the
            # walker saw (8, or 16 for a largesize moof)
            fragments.extend(_parse_moof(buf, b0, b1, b0 - _h))
    if not saw_moov:
        raise ValueError("mp4: no moov box")
    return Movie(brand, timescale, duration, tracks, fragments, bool(fragments))


# --------------------------------------------------------- sample extract


def extract_samples(buf: bytes, movie: Movie, track_id: int) -> list[bytes]:
    """Resolve the sample tables (or fragment runs) to per-sample bytes —
    14496-12 §8.7's chunk-offset/sample-to-chunk/sample-size walk."""
    tr = next((t for t in movie.tracks if t.track_id == track_id), None)
    if tr is None:
        raise ValueError(f"mp4: no track {track_id}")
    out: list[bytes] = []
    if movie.fragmented:
        for fr in movie.fragments:
            if fr.track_id != track_id:
                continue
            pos = fr.base_offset + fr.data_offset
            for sz in fr.sample_sizes:
                out.append(buf[pos : pos + sz])
                pos += sz
        return out
    n_samples = tr.n_samples
    sizes = tr.sample_sizes or [tr.constant_size] * n_samples
    # expand stsc: entry i applies to chunks [first_i, first_{i+1})
    si = 0
    for ci, chunk_off in enumerate(tr.chunk_offsets, start=1):
        per = 0
        for first, cnt, _desc in tr.stsc:
            if ci >= first:
                per = cnt
        pos = chunk_off
        for _ in range(per):
            if si >= n_samples:
                break
            out.append(buf[pos : pos + sizes[si]])
            pos += sizes[si]
            si += 1
    if si != n_samples:
        raise ValueError("mp4: sample tables inconsistent with chunk layout")
    return out


# ------------------------------------------------------------------ muxer


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, bytes([version]) + flags.to_bytes(3, "big") + body)


def _ipcm_entry(channels: int, rate: int) -> bytes:
    ase = (
        b"\x00" * 6 + struct.pack(">H", 1)  # reserved + data_reference_index
        + b"\x00" * 8
        + struct.pack(">HHHH", channels, 16, 0, 0)
        + struct.pack(">I", rate << 16)
    )
    pcmc = _full(b"pcmC", 0, 0, bytes([0x00, 16]))  # big-endian, 16-bit
    return _box(b"ipcm", ase + pcmc)


def encode_mp4_pcm(
    samples: list[int],
    sample_rate: int = 8000,
    channels: int = 1,
    fragmented: bool = False,
    n_chunks: int = 2,
    co64: bool = False,
) -> bytes:
    """Mux interleaved int16 PCM into a real ISO BMFF file.

    Flat form: ftyp + mdat (split into ``n_chunks`` chunks so the
    stsc/stco indirection is exercised) + moov with full sample tables.
    Fragmented form: ftyp + moov (mvex/trex, empty tables) + one
    moof+mdat pair per chunk — the CMAF/DASH segment shape, using the
    default-base-is-moof convention.  Samples are frames of
    ``channels`` int16s, big-endian per the pcmC config emitted."""
    if len(samples) % channels:
        raise ValueError("sample count must divide by channels")
    n_frames = len(samples) // channels
    frame_bytes = 2 * channels
    pcm = b"".join(
        struct.pack(">h", s) for s in samples
    )
    frames = [
        pcm[i * frame_bytes : (i + 1) * frame_bytes] for i in range(n_frames)
    ]
    # split frames into chunks as evenly as possible
    base, rem = divmod(n_frames, n_chunks)
    sizes = [base + (1 if i < rem else 0) for i in range(n_chunks)]
    chunks, at = [], 0
    for sz in sizes:
        chunks.append(b"".join(frames[at : at + sz]))
        at += sz

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom" + b"iso6")

    def mvhd_tkhd_mdia(dur_frames: int, include_tables: bool) -> bytes:
        mvhd = _full(
            b"mvhd", 0, 0,
            struct.pack(">II", 0, 0)
            + struct.pack(">II", sample_rate, dur_frames)
            + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
            + b"\x00" * 10
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + b"\x00" * 24 + struct.pack(">I", 2),
        )
        tkhd = _full(
            b"tkhd", 0, 7,
            struct.pack(">IIII", 0, 0, 1, 0) + struct.pack(">I", dur_frames)
            + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0x0100, 0)
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", 0, 0),
        )
        mdhd = _full(
            b"mdhd", 0, 0,
            struct.pack(">IIII", 0, 0, sample_rate, dur_frames)
            + struct.pack(">HH", 0x55C4, 0),  # language 'und'
        )
        hdlr = _full(
            b"hdlr", 0, 0,
            struct.pack(">I", 0) + b"soun" + b"\x00" * 12 + b"pcm\x00",
        )
        smhd = _full(b"smhd", 0, 0, struct.pack(">hH", 0, 0))
        dref = _full(
            b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")
        )
        dinf = _box(b"dinf", dref)
        stsd = _full(
            b"stsd", 0, 0,
            struct.pack(">I", 1) + _ipcm_entry(channels, sample_rate),
        )
        if include_tables:
            stts = _full(
                b"stts", 0, 0, struct.pack(">III", 1, dur_frames, 1)
            )
            stsc_entries = []
            prev = None
            for ci, sz in enumerate(sizes, start=1):
                if sz != prev:
                    stsc_entries.append((ci, sz, 1))
                    prev = sz
            stsc = _full(
                b"stsc", 0, 0,
                struct.pack(">I", len(stsc_entries))
                + b"".join(struct.pack(">III", *e) for e in stsc_entries),
            )
            stsz = _full(
                b"stsz", 0, 0, struct.pack(">III", frame_bytes, dur_frames, 0)
            )
            # chunk offsets are filled in by the caller via placeholder
            stco = None  # assembled below where offsets are known
        else:
            stts = _full(b"stts", 0, 0, struct.pack(">I", 0))
            stsc = _full(b"stsc", 0, 0, struct.pack(">I", 0))
            stsz = _full(b"stsz", 0, 0, struct.pack(">III", 0, 0, 0))
            stco = _full(b"stco", 0, 0, struct.pack(">I", 0))
        return mvhd, tkhd, mdhd, hdlr, smhd, dinf, stsd, stts, stsc, stsz, stco

    if not fragmented:
        # layout: ftyp | mdat(hdr+payload) | moov — so chunk offsets are
        # known before moov is assembled
        mdat_payload = b"".join(chunks)
        mdat = _box(b"mdat", mdat_payload)
        data0 = len(ftyp) + 8
        offsets = []
        at = data0
        for c in chunks:
            offsets.append(at)
            at += len(c)
        (mvhd, tkhd, mdhd, hdlr, smhd, dinf, stsd,
         stts, stsc, stsz, _none) = mvhd_tkhd_mdia(n_frames, True)
        if co64:
            stco = _full(
                b"co64", 0, 0,
                struct.pack(">I", len(offsets))
                + b"".join(struct.pack(">Q", o) for o in offsets),
            )
        else:
            stco = _full(
                b"stco", 0, 0,
                struct.pack(">I", len(offsets))
                + b"".join(struct.pack(">I", o) for o in offsets),
            )
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = _box(b"minf", smhd + dinf + stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", tkhd + mdia)
        moov = _box(b"moov", mvhd + trak)
        return ftyp + mdat + moov

    (mvhd, tkhd, mdhd, hdlr, smhd, dinf, stsd,
     stts, stsc, stsz, stco) = mvhd_tkhd_mdia(n_frames, False)
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", smhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    trex = _full(
        b"trex", 0, 0, struct.pack(">IIIII", 1, 1, 1, frame_bytes, 0)
    )
    moov = _box(b"moov", mvhd + trak + _box(b"mvex", trex))
    out = bytearray(ftyp + moov)
    seq = 1
    for c, sz in zip(chunks, sizes):
        mfhd = _full(b"mfhd", 0, 0, struct.pack(">I", seq))
        # tfhd flags: default-base-is-moof (0x020000) + default-sample-size
        tfhd = _full(
            b"tfhd", 0, 0x020010, struct.pack(">II", 1, frame_bytes)
        )
        # trun flags: data-offset present (0x1); sizes via tfhd default
        trun_body = struct.pack(">I", sz) + struct.pack(">i", 0)
        trun = _full(b"trun", 0, 0x000001, trun_body)
        traf = _box(b"traf", tfhd + trun)
        moof = _box(b"moof", mfhd + traf)
        # data offset: from moof start to mdat payload (moof + mdat header)
        data_off = len(moof) + 8
        trun_body = struct.pack(">I", sz) + struct.pack(">i", data_off)
        trun = _full(b"trun", 0, 0x000001, trun_body)
        traf = _box(b"traf", tfhd + trun)
        moof = _box(b"moof", mfhd + traf)
        out += moof + _box(b"mdat", c)
        seq += 1
    return bytes(out)


def decode_mp4_pcm(buf: bytes) -> tuple[int, int, list[int]]:
    """Demux + decode the ``ipcm`` track: returns
    ``(sample_rate, channels, interleaved int16 samples)``.  Raises the
    documented seam error for compressed sample entries — the container
    layer is complete; codec payloads are where external decoders plug
    in on a real cluster."""
    movie = parse_mp4(buf)
    audio = [t for t in movie.tracks if t.handler == "soun"]
    if not audio:
        raise ValueError("mp4: no audio track")
    tr = audio[0]
    if tr.entry.codec not in ("ipcm", "fpcm"):
        raise NotImplementedError(
            f"mp4: compressed sample entry {tr.entry.codec!r} needs an "
            "external codec (the documented seam); container demux "
            "(tracks, durations, sample extraction) is available"
        )
    if tr.entry.sample_size_bits not in (0, 16):
        # pcmC declared 24/32-bit samples; unpacking 'h' would silently
        # produce garbage — fail at the documented seam instead
        raise NotImplementedError(
            f"mp4: {tr.entry.sample_size_bits}-bit PCM decode is not "
            "implemented (only 16-bit); container demux is available"
        )
    raw = b"".join(extract_samples(buf, movie, tr.track_id))
    endian = ">" if tr.entry.pcm_big_endian else "<"
    n = len(raw) // 2
    return (
        tr.entry.sample_rate,
        tr.entry.channels,
        list(struct.unpack(f"{endian}{n}h", raw)),
    )


def _mp4a_entry(channels: int, rate: int, esds_body: bytes) -> bytes:
    ase = (
        b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 8
        + struct.pack(">HHHH", channels, 16, 0, 0)
        + struct.pack(">I", rate << 16)
    )
    return _box(b"mp4a", ase + _box(b"esds", esds_body))


def encode_mp4_aac(
    frame_payloads: list,
    rate_index: int,
    channels: int,
    avg_bitrate: int = 64000,
) -> bytes:
    """Mux opaque AAC access units into a real flat ISO BMFF file whose
    sample entry is ``mp4a`` carrying a genuine esds descriptor chain
    (operators/aac.py write_esds + AudioSpecificConfig).  The payload
    bytes are NOT encoded audio — this writer exists to exercise the
    container metadata path (parameter probing via esds, per-sample
    stsz sizes, 1024-tick AAC frame durations); payload decode raises
    the documented seam in ``decode_pcm_samples``."""
    from .aac import SAMPLE_RATES, write_asc, write_esds

    rate = SAMPLE_RATES[rate_index]
    esds_body = write_esds(write_asc(2, rate_index, channels), avg_bitrate)
    n = len(frame_payloads)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom" + b"iso6")
    mdat_payload = b"".join(frame_payloads)
    mdat = _box(b"mdat", mdat_payload)
    dur = n * 1024  # media timescale ticks (1024 samples per AAC frame)
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">II", 0, 0)
        + struct.pack(">II", rate, dur)
        + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
        + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2),
    )
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIII", 0, 0, 1, 0) + struct.pack(">I", dur)
        + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0x0100, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", 0, 0),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, rate, dur) + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"soun" + b"\x00" * 12 + b"aac\x00",
    )
    smhd = _full(b"smhd", 0, 0, struct.pack(">hH", 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    stsd = _full(
        b"stsd", 0, 0,
        struct.pack(">I", 1) + _mp4a_entry(channels, rate, esds_body),
    )
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1024))
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", 1) + struct.pack(">III", 1, n, 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(p)) for p in frame_payloads),
    )
    stco = _full(
        b"stco", 0, 0, struct.pack(">II", 1, len(ftyp) + 8)
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", smhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# ------------------------------------------------- AVIF / HEIC probe
# (ISO/IEC 23008-12 image file format over the same BMFF box walk —
# full AV1/HEVC payload decode genuinely needs external codecs and
# stays the documented seam; what a corpus pipeline needs BEFORE any
# codec runs is the probe: brand, dimensions, alpha, EXIF presence.)

_IMAGE_BRANDS = {
    b"avif": "avif", b"avis": "avif-sequence",
    b"heic": "heic", b"heix": "heic", b"mif1": "heif",
}
_ALPHA_URN = b"urn:mpeg:mpegB:cicp:systems:auxiliary:alpha"


def encode_image_bmff(
    width: int,
    height: int,
    brand: str = "avif",
    alpha: bool = False,
    exif: bool = False,
) -> bytes:
    """A structurally valid single-image HEIF/AVIF shell: ftyp + meta
    (hdlr 'pict', pitm, iinf with the primary 'av01'/'hvc1' item and
    optionally an 'Exif' item, iprp/ipco carrying ispe and optionally
    the alpha auxC) + an opaque mdat stub standing in for the coded
    payload (the probe never reads it)."""
    major = brand.encode("ascii")
    ftyp = _box(b"ftyp", major + struct.pack(">I", 0) + major + b"mif1")
    hdlr = _full(b"hdlr", 0, 0,
                 b"\x00" * 4 + b"pict" + b"\x00" * 12 + b"probe\x00")
    pitm = _full(b"pitm", 0, 0, struct.pack(">H", 1))
    item_type = b"av01" if brand.startswith("avi") else b"hvc1"
    infes = [
        _full(b"infe", 2, 0,
              struct.pack(">HH", 1, 0) + item_type + b"Image\x00"),
    ]
    if exif:
        infes.append(
            _full(b"infe", 2, 0,
                  struct.pack(">HH", 2, 0) + b"Exif" + b"Exif\x00")
        )
    iinf = _full(b"iinf", 0, 0,
                 struct.pack(">H", len(infes)) + b"".join(infes))
    props = [_full(b"ispe", 0, 0, struct.pack(">II", width, height))]
    if alpha:
        props.append(_full(b"auxC", 0, 0, _ALPHA_URN + b"\x00"))
    ipco = _box(b"ipco", b"".join(props))
    iprp = _box(b"iprp", ipco)
    meta = _full(b"meta", 0, 0, hdlr + pitm + iinf + iprp)
    mdat = _box(b"mdat", b"\x00" * 16)
    return ftyp + meta + mdat


def probe_image_bmff(blob: bytes) -> dict:
    """Probe an AVIF/HEIC file: ``{'brand', 'width', 'height',
    'has_alpha', 'has_exif'}``.  Raises ValueError on a non-image
    brand, a missing/unreadable meta walk, or torn boxes; the CODED
    payload is never touched (decode is the documented seam)."""
    brand = None
    meta_span = None
    for fc, _h, b0, b1 in walk_boxes(blob):
        if fc == b"ftyp":
            major = blob[b0 : b0 + 4]
            if major not in _IMAGE_BRANDS:
                raise ValueError(
                    f"bmff: major brand {major!r} is not an image brand"
                )
            brand = _IMAGE_BRANDS[major]
        elif fc == b"meta":
            meta_span = (b0 + 4, b1)  # meta is a FullBox
    if brand is None:
        raise ValueError("bmff: no ftyp box")
    if meta_span is None:
        raise ValueError("bmff: image file carries no meta box")
    width = height = None
    has_alpha = has_exif = False
    for fc, _h, b0, b1 in walk_boxes(blob, *meta_span):
        if fc == b"iinf":
            # FullBox version/flags (4) + u16 entry_count, then infes
            for fc2, _h2, c0, c1 in walk_boxes(blob, b0 + 6, b1):
                if fc2 == b"infe" and blob[c0 + 8 : c0 + 12] == b"Exif":
                    has_exif = True
        elif fc == b"iprp":
            for fc2, _h2, c0, c1 in walk_boxes(blob, b0, b1):
                if fc2 != b"ipco":
                    continue
                for fc3, _h3, d0, d1 in walk_boxes(blob, c0, c1):
                    if fc3 == b"ispe":
                        width, height = struct.unpack_from(
                            ">II", blob, d0 + 4
                        )
                    elif fc3 == b"auxC" and blob[d0 + 4 : d1].startswith(
                        _ALPHA_URN
                    ):
                        has_alpha = True
    if width is None:
        raise ValueError("bmff: no ispe property (dimensions unknown)")
    return {
        "brand": brand,
        "width": width,
        "height": height,
        "has_alpha": has_alpha,
        "has_exif": has_exif,
    }
