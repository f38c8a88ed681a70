"""ISO BMFF (MP4) container codec tests — operators/mp4.py.

The muxer/demuxer is written from the public spec (ISO/IEC 14496-12 box
structure + 23003-5 PCM sample entries); no stdlib reference demuxer
exists, so the evidence is exhaustive round-trips across the surface
(mono/stereo × flat/fragmented × stco/co64), structural-damage loudness,
and spec-mandated reader behaviors (unknown-box skip, largesize).
"""

from __future__ import annotations

import random
import struct

import pytest

from etl_pipeline_old_spark.operators.mp4 import (
    decode_mp4_pcm,
    encode_mp4_pcm,
    extract_samples,
    parse_mp4,
    walk_boxes,
)


def _sig(n: int, seed: int) -> list[int]:
    rnd = random.Random(seed)
    return [rnd.randint(-32768, 32767) for _ in range(n)]


@pytest.mark.parametrize("channels", [1, 2])
@pytest.mark.parametrize("fragmented", [False, True])
@pytest.mark.parametrize("n_chunks", [1, 2, 3, 5])
def test_roundtrip_surface(channels, fragmented, n_chunks):
    sig = _sig(60 * channels, seed=channels * 10 + n_chunks)
    buf = encode_mp4_pcm(
        sig, 16000, channels, fragmented=fragmented, n_chunks=n_chunks
    )
    rate, ch, out = decode_mp4_pcm(buf)
    assert (rate, ch, out) == (16000, channels, sig)
    movie = parse_mp4(buf)
    assert movie.fragmented == fragmented
    assert movie.brand == "isom"
    tr = movie.tracks[0]
    assert tr.handler == "soun"
    assert tr.entry.codec == "ipcm"
    assert tr.entry.channels == channels


def test_co64_offsets_roundtrip():
    sig = _sig(64, seed=3)
    buf = encode_mp4_pcm(sig, 8000, 1, n_chunks=2, co64=True)
    assert b"co64" in buf and b"stco" not in buf
    assert decode_mp4_pcm(buf)[2] == sig


def test_flat_equals_fragmented_decode():
    sig = _sig(128, seed=4)
    flat = encode_mp4_pcm(sig, 8000, 2, fragmented=False, n_chunks=3)
    frag = encode_mp4_pcm(sig, 8000, 2, fragmented=True, n_chunks=3)
    assert decode_mp4_pcm(flat) == decode_mp4_pcm(frag)


def test_unknown_top_level_box_is_skipped():
    # readers MUST skip boxes they don't know (14496-12 §4.2) — splice a
    # free-form box between ftyp and mdat; offsets in stco point at the
    # ORIGINAL layout, so rebuild: append the unknown box at the END,
    # where it cannot disturb chunk offsets.
    sig = _sig(16, seed=5)
    buf = encode_mp4_pcm(sig, 8000, 1)
    junk = struct.pack(">I", 8 + 11) + b"xywz" + b"hello world"
    assert decode_mp4_pcm(buf + junk)[2] == sig


def test_largesize_box_walk():
    body = b"payload"
    big = struct.pack(">I", 1) + b"blob" + struct.pack(">Q", 16 + len(body)) + body
    [(fc, hdr, b0, b1)] = list(walk_boxes(big))
    assert fc == b"blob" and hdr == 16 and big[b0:b1] == body


def test_truncation_is_loud():
    buf = encode_mp4_pcm(_sig(32, seed=6), 8000, 1)
    with pytest.raises(ValueError, match="runs past end"):
        parse_mp4(buf[:-3])


def test_missing_moov_is_loud():
    buf = encode_mp4_pcm(_sig(8, seed=7), 8000, 1)
    # keep only ftyp + mdat
    boxes = list(walk_boxes(buf))
    end_of_mdat = [b1 for fc, _h, _b0, b1 in boxes if fc == b"mdat"][0]
    with pytest.raises(ValueError, match="no moov"):
        parse_mp4(buf[:end_of_mdat])


def test_compressed_entry_raises_documented_seam():
    buf = bytearray(encode_mp4_pcm(_sig(8, seed=8), 8000, 1))
    i = buf.find(b"ipcm")
    buf[i : i + 4] = b"mp4a"  # pretend the track is AAC
    with pytest.raises(NotImplementedError, match="external codec"):
        decode_mp4_pcm(bytes(buf))


def test_inconsistent_sample_tables_are_loud():
    buf = bytearray(encode_mp4_pcm(_sig(8, seed=9), 8000, 1, n_chunks=2))
    # stts entry 0: body = version/flags(4) + entry_count(4) +
    # (sample_count, delta); inflate the sample count so the chunk walk
    # comes up short of the declared total
    i = buf.find(b"stts") + 4
    cnt = struct.unpack_from(">I", buf, i + 8)[0]
    struct.pack_into(">I", buf, i + 8, cnt + 4)
    movie = parse_mp4(bytes(buf))
    with pytest.raises(ValueError, match="inconsistent"):
        extract_samples(bytes(buf), movie, 1)


def test_largesize_moof_fragment_base():
    # a legal moof may use the 16-byte largesize header; the fragment base
    # must be the box START (payload start minus the actual header size),
    # not a hardcoded payload-minus-8
    sig = _sig(24, seed=11)
    buf = encode_mp4_pcm(sig, 8000, 1, fragmented=True, n_chunks=1)
    m0, m1 = next(
        (b0, b1) for fc, _h, b0, b1 in walk_boxes(buf) if fc == b"moof"
    )
    payload = buf[m0:m1]
    big = struct.pack(">I", 1) + b"moof" + struct.pack(">Q", 16 + len(payload))
    out = bytearray(buf[: m0 - 8] + big + payload + buf[m1:])
    # the moof payload (and the mdat after it) moved +8, so the trun
    # data-offset (relative to moof start) must grow by 8 too
    i = out.find(b"trun")
    off = struct.unpack_from(">i", out, i + 12)[0]
    struct.pack_into(">i", out, i + 12, off + 8)
    assert decode_mp4_pcm(bytes(out))[2] == sig


def _full_box(fourcc, ver, flags, body):
    payload = bytes([ver]) + flags.to_bytes(3, "big") + body
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def test_traf_base_inheritance_is_loud():
    # 2nd+ traf with neither an explicit base-data-offset nor
    # default-base-is-moof inherits end-of-previous-run (14496-12 §8.8.7)
    # — unsupported, must refuse rather than read wrong bytes
    base_file = encode_mp4_pcm(_sig(8, seed=12), 8000, 1)

    def _traf(track_id, flags):
        tfhd = _full_box(b"tfhd", 0, flags, struct.pack(">I", track_id))
        return struct.pack(">I", 8 + len(tfhd)) + b"traf" + tfhd

    good = _traf(1, 0x020000) + _traf(2, 0x020000)
    moof = struct.pack(">I", 8 + len(good)) + b"moof" + good
    parse_mp4(base_file + moof)  # both default-base-is-moof: fine
    bad = _traf(1, 0x020000) + _traf(2, 0)
    moof = struct.pack(">I", 8 + len(bad)) + b"moof" + bad
    with pytest.raises(ValueError, match="inheritance"):
        parse_mp4(base_file + moof)
    # FIRST traf without flags: spec default IS moof start — no raise
    first_only = _traf(1, 0)
    moof = struct.pack(">I", 8 + len(first_only)) + b"moof" + first_only
    parse_mp4(base_file + moof)


def test_24bit_pcm_decode_is_loud():
    buf = bytearray(encode_mp4_pcm(_sig(8, seed=13), 8000, 1))
    i = buf.find(b"pcmC")
    assert buf[i + 9] == 16  # format_flags byte then PCM_sample_size
    buf[i + 9] = 24
    with pytest.raises(NotImplementedError, match="24-bit PCM"):
        decode_mp4_pcm(bytes(buf))


def test_audio_decode_entry_routes_ftyp():
    from etl_pipeline_old_spark.operators.multimodal import decode_audio_real

    sig = _sig(32, seed=10)
    buf = encode_mp4_pcm(sig, 8000, 1, fragmented=True, n_chunks=2)
    assert decode_audio_real(buf) == (8000, 1, sig)
