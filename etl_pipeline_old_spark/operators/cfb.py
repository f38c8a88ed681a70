"""OLE2 / CFB (Compound File Binary, [MS-CFB]) container + legacy
Office text recovery ([MS-DOC] Word 97-2003 piece table, BIFF8 .xls
cell records) — own pure-stdlib codec.

Why this exists: every pre-2007 Office document — and a huge share of
any enterprise or crawl corpus — ships as an OLE2 compound file
(.doc/.xls/.ppt, plus MSI, MSG, and friends).  The reference pipeline's
domain (BIM/construction) is exactly the world still mailing .doc
around.  No CFB implementation exists in this container (no olefile,
no compoundfiles), so — like FLAC, VP8L, and BSON — the codec is pinned
by the public specs: an own writer stages fixtures, oracles demand
byte-exact text recovery, and damage classes are loud.

Structure implemented (v3, 512-byte sectors; v4 4096 accepted on read):
- header: signature D0CF11E0A1B11AE1, sector/mini-sector shifts, DIFAT
  (109 header entries + chained DIFAT sectors), FAT/miniFAT locations;
- FAT sector chains with cycle guards; miniFAT chains over the 64-byte
  mini stream held by the root entry (streams under the 4096 cutoff);
- directory: 128-byte entries, UTF-16LE names, storage/stream types,
  sibling BSTs walked from each storage's child pointer.

Honesty notes: the writer emits sibling trees as spec-ordered balanced
BSTs with all nodes colored black — red-black BALANCE is a hint, and
[MS-CFB] §2.6.4 tells readers to tolerate violations (ours ignores
color entirely).  The [MS-DOC] reader recovers the main document text
through the Clx/PlcPcd piece table (both compressed-cp1252-style and
UTF-16 pieces, both 0Table/1Table homes); properties, fields, tables,
and embedded objects are out of scope and invisible to it.  BIFF8
CONTINUE-split SSTs parse natively ([MS-XLS] 2.4.58: headers never
split, character data splits at character boundaries, each continuing
fragment re-emits its own fHighByte flag — the shape every
production-sized .xls ships); fRichSt FormatRuns and fExtSt phonetic
blocks are header-counted and skipped past (non-character
continuation, which does NOT re-emit the flags byte).

Damage raises ValueError: bad signature, sector references past the
file, FAT/miniFAT/DIFAT chain cycles, truncated sectors, directory
entries with impossible sizes, piece tables that disagree with ccpText.
"""

from __future__ import annotations

import struct

_SIGNATURE = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC
_NOSTREAM = 0xFFFFFFFF
_MINI_CUTOFF = 4096
_MINI_SHIFT = 6  # 64-byte mini sectors


# ------------------------------------------------------------- writer


def _dir_entry(
    name: str,
    otype: int,
    left: int = _NOSTREAM,
    right: int = _NOSTREAM,
    child: int = _NOSTREAM,
    start: int = _ENDOFCHAIN,
    size: int = 0,
) -> bytes:
    enc = name.encode("utf-16-le") + b"\x00\x00"
    if len(enc) > 64:
        raise ValueError(f"cfb: name too long: {name!r}")
    return (
        enc.ljust(64, b"\x00")
        + struct.pack(
            "<HBBIII16sIQQIQ",
            len(enc),          # name length incl. terminator, bytes
            otype,             # 0 unknown / 1 storage / 2 stream / 5 root
            1,                 # color: black (balance is a hint)
            left,
            right,
            child,
            b"\x00" * 16,      # CLSID
            0,                 # state bits
            0,                 # creation time
            0,                 # modified time
            start & 0xFFFFFFFF,
            size,
        )
    )


def write_cfb(
    streams: dict[str, bytes], degenerate_siblings: bool = False
) -> bytes:
    """A complete v3 (512-byte sector) compound file holding the given
    streams; a '/' in a key creates nested STORAGE entries (the .msg
    layout — recipient/attachment objects are storages).  Streams under
    the 4096-byte cutoff live in the mini stream (64-byte mini sectors
    chained through the miniFAT), larger ones in regular FAT chains —
    both paths exercised whenever the inputs span the cutoff.  Each
    storage's children form the spec-ordered (name length, then
    uppercase name) balanced sibling BST — unless
    ``degenerate_siblings``, which chains them as a right-leaning
    linked list instead: legal per [MS-CFB] (readers must tolerate
    unbalanced trees) and the shape that probes a reader's walk for
    entry-count-scaled recursion."""
    ssz = 512

    def pad(b: bytes, unit: int) -> bytes:
        return b + b"\x00" * (-len(b) % unit)

    # path keys -> a tree of {name: bytes | subtree}
    tree: dict = {}
    for path, data in streams.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            nxt = node.setdefault(p, {})
            if not isinstance(nxt, dict):
                raise ValueError(f"cfb: {p!r} is both a stream and a storage")
            node = nxt
        if parts[-1] in node:
            raise ValueError(f"cfb: duplicate entry {path!r}")
        node[parts[-1]] = data

    # directory ids in DFS insertion order (root = 0); sibling BSTs per
    # storage with the spec sort
    specs: list[dict] = []

    def build_dir(children: dict) -> int:
        mine = []
        for name, obj in children.items():
            sp = {"name": name, "id": len(specs) + 1, "obj": obj,
                  "left": _NOSTREAM, "right": _NOSTREAM,
                  "child": _NOSTREAM}
            specs.append(sp)
            mine.append(sp)
            if isinstance(obj, dict):
                sp["child"] = build_dir(obj)
        ordered = sorted(
            mine, key=lambda s: (len(s["name"]), s["name"].upper())
        )
        if degenerate_siblings:
            for a, b in zip(ordered, ordered[1:]):
                a["right"] = b["id"]
            return ordered[0]["id"] if ordered else _NOSTREAM

        def bst(lo: int, hi: int) -> int:
            if lo > hi:
                return _NOSTREAM
            mid = (lo + hi) // 2
            ordered[mid]["left"] = bst(lo, mid - 1)
            ordered[mid]["right"] = bst(mid + 1, hi)
            return ordered[mid]["id"]

        return bst(0, len(ordered) - 1)

    tree_root = build_dir(tree)
    stream_specs = [s for s in specs if not isinstance(s["obj"], dict)]

    # mini stream assembly: small streams -> 64-byte sectors
    mini_data = bytearray()
    minifat: list[int] = []
    mini_starts: dict[int, int] = {}
    for sp in stream_specs:
        data = sp["obj"]
        if len(data) < _MINI_CUTOFF:
            start = len(minifat)
            chunk = pad(data, 64) if data else b""
            nsec = len(chunk) // 64
            mini_data += chunk
            for k in range(nsec):
                minifat.append(start + k + 1 if k + 1 < nsec else _ENDOFCHAIN)
            mini_starts[sp["id"]] = start if nsec else _ENDOFCHAIN

    # sector plan: [FAT sectors][directory][miniFAT][mini stream][big streams]
    # sizes first, so FAT length (and thus FAT sector count) is solvable
    n_dir_entries = 1 + len(specs)
    dir_sectors = -(-n_dir_entries * 128 // ssz)
    minifat_bytes = pad(b"".join(struct.pack("<I", x) for x in minifat), ssz)
    minifat_sectors = len(minifat_bytes) // ssz if minifat else 0
    mini_bytes = pad(bytes(mini_data), ssz)
    mini_sectors = len(mini_bytes) // ssz if mini_data else 0
    big: dict[int, bytes] = {
        sp["id"]: pad(sp["obj"], ssz)
        for sp in stream_specs
        if len(sp["obj"]) >= _MINI_CUTOFF
    }
    big_sectors = sum(len(d) // ssz for d in big.values())

    payload_sectors = dir_sectors + minifat_sectors + mini_sectors + big_sectors
    # solve FAT count: f FAT sectors cover (f + payload) entries
    fat_sectors = 1
    while fat_sectors * (ssz // 4) < fat_sectors + payload_sectors:
        fat_sectors += 1
    if fat_sectors > 109:
        raise ValueError("cfb: writer supports header-DIFAT files only")

    fat: list[int] = [_FATSECT] * fat_sectors
    sect = fat_sectors

    def alloc(nsec: int) -> int:
        nonlocal sect
        if nsec == 0:
            return _ENDOFCHAIN
        start = sect
        for k in range(nsec):
            fat.append(start + k + 1 if k + 1 < nsec else _ENDOFCHAIN)
        sect += nsec
        return start

    first_dir = alloc(dir_sectors)
    first_minifat = alloc(minifat_sectors)
    mini_start = alloc(mini_sectors)
    big_starts = {i: alloc(len(d) // ssz) for i, d in big.items()}

    # directory
    entries = [
        _dir_entry(
            "Root Entry", 5, child=tree_root,
            start=mini_start if mini_data else _ENDOFCHAIN,
            size=len(mini_data),
        )
    ]
    for sp in specs:
        if isinstance(sp["obj"], dict):
            entries.append(
                _dir_entry(sp["name"], 1, left=sp["left"],
                           right=sp["right"], child=sp["child"])
            )
        else:
            start = (
                big_starts[sp["id"]]
                if sp["id"] in big
                else mini_starts[sp["id"]]
            )
            entries.append(
                _dir_entry(sp["name"], 2, left=sp["left"],
                           right=sp["right"], start=start,
                           size=len(sp["obj"]))
            )
    dir_bytes = pad(b"".join(entries), ssz)

    header = (
        _SIGNATURE
        + b"\x00" * 16
        + struct.pack(
            "<HHHHHHIIIIIIIII",
            0x003E, 0x0003,      # minor, major (v3)
            0xFFFE,              # little-endian marker
            9, _MINI_SHIFT,      # sector / mini-sector shifts
            0, 0,                # reserved, reserved
            0,                   # v3: directory sector count must be 0
            fat_sectors,
            first_dir,
            0,                   # transaction signature
            _MINI_CUTOFF,
            first_minifat if minifat_sectors else _ENDOFCHAIN,
            minifat_sectors,
            _ENDOFCHAIN,         # first DIFAT sector (header-only DIFAT)
        )
        + struct.pack("<I", 0)   # DIFAT sector count
    )
    difat = list(range(fat_sectors)) + [_FREESECT] * (109 - fat_sectors)
    header += b"".join(struct.pack("<I", x) for x in difat)
    assert len(header) == 512

    fat_bytes = pad(b"".join(struct.pack("<I", x) for x in fat), ssz)
    body = (
        fat_bytes
        + dir_bytes
        + (minifat_bytes if minifat_sectors else b"")
        + (mini_bytes if mini_sectors else b"")
        + b"".join(big[i] for i in big)
    )
    return header + body


# ------------------------------------------------------------- reader


def _u32s(b: bytes) -> list[int]:
    return list(struct.unpack(f"<{len(b) // 4}I", b[: len(b) // 4 * 4]))


def _read_chain(fat: list[int], start: int, what: str) -> list[int]:
    chain, cur, seen = [], start, set()
    while cur != _ENDOFCHAIN:
        if cur in (_FREESECT, _FATSECT, _DIFSECT) or cur >= len(fat):
            raise ValueError(f"cfb: {what} chain hits sector {cur:#x}")
        if cur in seen:
            raise ValueError(f"cfb: {what} chain cycles at sector {cur}")
        seen.add(cur)
        chain.append(cur)
        cur = fat[cur]
    return chain


def read_cfb(blob: bytes) -> dict[str, bytes]:
    """Parse a compound file into {path: stream_bytes}; nested storages
    join path segments with '/'.  Strict: every structural lie raises."""
    if blob[:8] != _SIGNATURE:
        raise ValueError(f"cfb: bad signature {blob[:8]!r}")
    if len(blob) < 512:
        raise ValueError("cfb: truncated header")
    (
        _minor, major, order, sshift, mshift, _r1, _r2, _ndir, nfat,
        first_dir, _tsig, cutoff, first_minifat, nminifat, first_difat,
    ) = struct.unpack("<HHHHHHIIIIIIIII", blob[24:72])
    ndifat = struct.unpack("<I", blob[72:76])[0]
    if order != 0xFFFE:
        raise ValueError(f"cfb: byte-order mark {order:#x}")
    if (major, sshift) not in ((3, 9), (4, 12)):
        raise ValueError(f"cfb: version {major} / sector shift {sshift}")
    ssz = 1 << sshift
    msz = 1 << mshift

    def sector(n: int) -> bytes:
        off = 512 + n * ssz if major == 3 else (n + 1) * ssz
        if off + ssz > len(blob):
            raise ValueError(f"cfb: sector {n} past end of file")
        return blob[off : off + ssz]

    # DIFAT: 109 header entries, then chained DIFAT sectors
    difat = _u32s(blob[76:512])
    cur, hops = first_difat, 0
    while cur != _ENDOFCHAIN and cur != _FREESECT:
        if hops > ndifat + 1:
            raise ValueError("cfb: DIFAT chain longer than declared")
        s = sector(cur)
        difat += _u32s(s[:-4])
        cur = struct.unpack("<I", s[-4:])[0]
        hops += 1
    fat_sector_ids = [x for x in difat if x != _FREESECT][:nfat]
    if len(fat_sector_ids) < nfat:
        raise ValueError("cfb: DIFAT names fewer FAT sectors than declared")
    fat: list[int] = []
    for sid in fat_sector_ids:
        fat += _u32s(sector(sid))

    def read_stream_regular(start: int, size: int) -> bytes:
        chain = _read_chain(fat, start, "stream")
        data = b"".join(sector(s) for s in chain)
        if size > len(data):
            raise ValueError("cfb: stream size exceeds its chain")
        return data[:size]

    # directory
    dir_bytes = b"".join(sector(s) for s in _read_chain(fat, first_dir, "dir"))
    entries = []
    for i in range(len(dir_bytes) // 128):
        e = dir_bytes[i * 128 : (i + 1) * 128]
        nlen, otype = struct.unpack("<HB", e[64:67])
        if otype == 0:
            entries.append(None)
            continue
        if otype not in (1, 2, 5):
            raise ValueError(f"cfb: directory entry type {otype}")
        if nlen < 2 or nlen > 64 or nlen % 2:
            raise ValueError(f"cfb: directory name length {nlen}")
        name = e[: nlen - 2].decode("utf-16-le")
        left, right, child = struct.unpack("<iii", e[68:80])
        start, size = struct.unpack("<IQ", e[116:128])
        if major == 3:
            size &= 0xFFFFFFFF  # v3 writers leave the high half undefined
        entries.append((name, otype, left, right, child, start, size))
    if not entries or entries[0] is None or entries[0][1] != 5:
        raise ValueError("cfb: first directory entry is not the root")

    # miniFAT + mini stream (the root entry's stream)
    minifat: list[int] = []
    if nminifat:
        for s in _read_chain(fat, first_minifat, "miniFAT"):
            minifat += _u32s(sector(s))
    root_start, root_size = entries[0][5], entries[0][6]
    mini_stream = (
        read_stream_regular(root_start, root_size) if root_size else b""
    )

    def read_stream_mini(start: int, size: int) -> bytes:
        chain, cur, seen = [], start, set()
        while cur != _ENDOFCHAIN:
            if cur >= len(minifat):
                raise ValueError(f"cfb: mini chain hits sector {cur:#x}")
            if cur in seen:
                raise ValueError("cfb: mini chain cycles")
            seen.add(cur)
            chain.append(cur)
            cur = minifat[cur]
        data = b"".join(
            mini_stream[s * msz : (s + 1) * msz] for s in chain
        )
        if size > len(data):
            raise ValueError("cfb: mini stream size exceeds its chain")
        return data[:size]

    # walk the sibling BSTs from the root's child — with an EXPLICIT
    # stack, not recursion: [MS-CFB] tells readers to tolerate
    # unbalanced trees, so a legal-but-degenerate linked-list sibling
    # chain must not scale recursion depth with entry count (a ~1000
    # entry chain would RecursionError past the documented ValueError
    # quarantine class; r13 ADVICE)
    out: dict[str, bytes] = {}
    visited: set[int] = set()
    stack: list[tuple[int, str]] = [(entries[0][4], "")]
    while stack:
        idx, prefix = stack.pop()
        if idx == _NOSTREAM or idx < 0:
            continue
        if idx >= len(entries) or entries[idx] is None:
            raise ValueError(f"cfb: directory id {idx} out of range")
        if idx in visited:
            raise ValueError(f"cfb: directory tree cycles at id {idx}")
        visited.add(idx)
        name, otype, left, right, child, start, size = entries[idx]
        stack.append((left, prefix))
        stack.append((right, prefix))
        path = prefix + name
        if otype == 2:
            if size and size < cutoff:
                out[path] = read_stream_mini(start, size)
            elif size:
                out[path] = read_stream_regular(start, size)
            else:
                out[path] = b""
        else:  # storage: its child heads a sibling tree of its own
            stack.append((child, path + "/"))
    return out


# ----------------------------------------------- [MS-DOC] piece table

_FIB_SIZE = 1472  # Word 97 FIB block (0x05C0)
_WIDENT = 0xA5EC
_NFIB = 0x00C1

# [MS-DOC] 2.4.1 step 3: fCompressed bytes map to the char of equal
# value EXCEPT this table (the cp1252 C1 punctuation subset; bytes the
# table omits — 0x80, 0x81, 0x8D, 0x8E, 0x8F, 0x90, 0x9D, 0x9E — stay
# identity, which is NOT what a cp1252 decode would do for 0x80/0x8E/
# 0x9E, so the spec table is implemented literally).
_DOC_COMPRESSED_MAP = {
    0x82: 0x201A, 0x83: 0x0192, 0x84: 0x201E, 0x85: 0x2026, 0x86: 0x2020,
    0x87: 0x2021, 0x88: 0x02C6, 0x89: 0x2030, 0x8A: 0x0160, 0x8B: 0x2039,
    0x8C: 0x0152, 0x91: 0x2018, 0x92: 0x2019, 0x93: 0x201C, 0x94: 0x201D,
    0x95: 0x2022, 0x96: 0x2013, 0x97: 0x2014, 0x98: 0x02DC, 0x99: 0x2122,
    0x9A: 0x0161, 0x9B: 0x203A, 0x9C: 0x0153, 0x9F: 0x0178,
}
_DOC_COMPRESSED_INV = {v: k for k, v in _DOC_COMPRESSED_MAP.items()}


def _doc_compressible(piece: str) -> bool:
    return all(
        (ord(c) <= 0xFF and ord(c) not in _DOC_COMPRESSED_MAP.values()
         and not 0x82 <= ord(c) <= 0x9F)
        or ord(c) in _DOC_COMPRESSED_INV
        for c in piece
    )


def _doc_compress(piece: str) -> bytes:
    return bytes(
        _DOC_COMPRESSED_INV.get(ord(c), ord(c)) for c in piece
    )


def _doc_decompress(raw: bytes) -> str:
    return "".join(chr(_DOC_COMPRESSED_MAP.get(b, b)) for b in raw)


def write_doc(
    text: str, which_tbl: int = 1, piece_chars: int = 17,
    pad_to_regular: bool = False,
) -> bytes:
    """A structurally valid Word 97-2003 .doc: WordDocument stream (FIB
    + text pieces) and the piece table (Clx/PlcPcd) in the 0Table or
    1Table stream per ``which_tbl``.  Text is split into
    ``piece_chars``-char pieces stored ALTERNATELY compressed (when the
    chars allow) and UTF-16 — real files are multi-piece because that
    is how Word's fast-save worked, and a reader that assumes one piece
    or one encoding fails here.  ``pad_to_regular`` inflates the
    WordDocument stream past the 4096 mini cutoff, forcing the regular
    FAT path.  Word requires the text to end with a paragraph mark, so
    a final '\\r' is appended (ccpText includes it; extract_doc_text
    strips exactly one)."""
    full = text + "\r"
    pieces = [
        full[i : i + piece_chars] for i in range(0, len(full), piece_chars)
    ]
    word = bytearray(b"\x00" * _FIB_SIZE)
    struct.pack_into("<HH", word, 0, _WIDENT, _NFIB)
    flags = 0x0200 if which_tbl else 0x0000  # fWhichTblStm
    struct.pack_into("<H", word, 0x0A, flags)
    struct.pack_into("<H", word, 32, 0x000E)          # csw
    struct.pack_into("<H", word, 62, 0x0016)          # cslw
    struct.pack_into("<H", word, 152, 0x005D)         # cbRgFcLcb (97)
    struct.pack_into("<I", word, 76, len(full))       # ccpText
    if pad_to_regular:
        word += b"\x00" * _MINI_CUTOFF

    cps, pcds = [0], []
    for k, piece in enumerate(pieces):
        compressed = _doc_compressible(piece) and k % 2 == 0
        fc = len(word)
        if compressed:
            word += _doc_compress(piece)
            fc_field = (fc * 2) | 0x40000000
        else:
            word += piece.encode("utf-16-le")
            fc_field = fc
        cps.append(cps[-1] + len(piece))
        pcds.append(struct.pack("<HIH", 0, fc_field, 0))
    plcpcd = (
        b"".join(struct.pack("<I", cp) for cp in cps) + b"".join(pcds)
    )
    clx = b"\x02" + struct.pack("<I", len(plcpcd)) + plcpcd

    table = bytearray(b"\x00" * 16)  # nonzero fcClx proves it is READ
    fc_clx = len(table)
    table += clx
    struct.pack_into("<II", word, 0x01A2, fc_clx, len(clx))
    return write_cfb(
        {
            "WordDocument": bytes(word),
            ("1Table" if which_tbl else "0Table"): bytes(table),
            # the summary stream every real writer emits; content opaque
            "\x05SummaryInformation": b"\xfe\xff\x00\x00",
        }
    )


def extract_doc_text(blob: bytes) -> tuple[str, int]:
    """Recover the main document text of a Word 97-2003 .doc through
    the piece table; returns (text, n_pieces).  The FIB's variable
    layout is honored (csw/cslw/cbRgFcLcb walked, not hardcoded), both
    table-stream homes and both piece encodings handled.  Raises
    ValueError on every structural lie ([MS-DOC] refs in module doc)."""
    streams = read_cfb(blob)
    word = streams.get("WordDocument")
    if word is None:
        raise ValueError("doc: no WordDocument stream")
    if len(word) < 0x20:
        raise ValueError("doc: WordDocument stream too short")
    wident, _nfib = struct.unpack_from("<HH", word, 0)
    if wident != _WIDENT:
        raise ValueError(f"doc: wIdent {wident:#x}")
    flags = struct.unpack_from("<H", word, 0x0A)[0]
    tbl_name = "1Table" if flags & 0x0200 else "0Table"
    table = streams.get(tbl_name)
    if table is None:
        raise ValueError(f"doc: {tbl_name} stream missing")
    csw = struct.unpack_from("<H", word, 32)[0]
    pos = 34 + csw * 2
    cslw = struct.unpack_from("<H", word, pos)[0]
    fib_rg_lw = pos + 2
    ccp_text = struct.unpack_from("<I", word, fib_rg_lw + 12)[0]
    pos = fib_rg_lw + cslw * 4
    cb_rg = struct.unpack_from("<H", word, pos)[0]
    fib_rg_fclcb = pos + 2
    if cb_rg < 34:
        raise ValueError(f"doc: fibRgFcLcb too short ({cb_rg} pairs)")
    fc_clx, lcb_clx = struct.unpack_from(
        "<II", word, fib_rg_fclcb + 33 * 8
    )
    if lcb_clx < 5 or fc_clx + lcb_clx > len(table):
        raise ValueError("doc: Clx out of the table stream's range")
    clx = table[fc_clx : fc_clx + lcb_clx]

    # walk Clx: RgPrc entries (clxt=1) skipped, Pcdt (clxt=2) holds PlcPcd
    p = 0
    plcpcd = None
    while p < len(clx):
        clxt = clx[p]
        if clxt == 1:
            cb = struct.unpack_from("<h", clx, p + 1)[0]
            p += 3 + cb
        elif clxt == 2:
            lcb = struct.unpack_from("<I", clx, p + 1)[0]
            plcpcd = clx[p + 5 : p + 5 + lcb]
            if len(plcpcd) < lcb:
                raise ValueError("doc: PlcPcd truncated")
            break
        else:
            raise ValueError(f"doc: Clx entry type {clxt}")
    if plcpcd is None:
        raise ValueError("doc: no Pcdt in Clx")
    n = (len(plcpcd) - 4) // 12
    if n < 1 or len(plcpcd) != 4 * (n + 1) + 8 * n:
        raise ValueError(f"doc: PlcPcd size {len(plcpcd)} not 12n+4")
    cps = struct.unpack_from(f"<{n + 1}I", plcpcd, 0)
    out: list[str] = []
    total = 0
    for k in range(n):
        if total >= ccp_text:
            break
        nchars = min(cps[k + 1], ccp_text) - cps[k]
        fc_field = struct.unpack_from("<I", plcpcd, 4 * (n + 1) + 8 * k + 2)[0]
        if fc_field & 0x40000000:
            fc = (fc_field & 0x3FFFFFFF) // 2
            raw = word[fc : fc + nchars]
            if len(raw) < nchars:
                raise ValueError("doc: compressed piece past stream end")
            out.append(_doc_decompress(raw))
        else:
            fc = fc_field & 0x3FFFFFFF
            raw = word[fc : fc + 2 * nchars]
            if len(raw) < 2 * nchars:
                raise ValueError("doc: unicode piece past stream end")
            out.append(raw.decode("utf-16-le"))
        total += nchars
    if total != ccp_text:
        raise ValueError(f"doc: pieces cover {total} of ccpText {ccp_text}")
    text = "".join(out)
    if not text.endswith("\r"):
        raise ValueError("doc: text does not end with a paragraph mark")
    return text[:-1], n


# --------------------------------------------------- BIFF8 .xls cells

_BOF, _EOF, _SST, _LABELSST, _NUMBER = 0x0809, 0x000A, 0x00FC, 0x00FD, 0x0203
_RK = 0x027E
_CONTINUE = 0x003C


def _rk_encode(v: float) -> int | None:
    """[MS-XLS] RkNumber: bit0 fX100 (value was multiplied by 100),
    bit1 fInt (30-bit signed int vs the TOP 30 bits of an IEEE
    double).  Returns the packed 32-bit value, or None when the number
    needs a full NUMBER record — real writers emit RK whenever it fits,
    which is most cells."""
    import math

    def fits_int(x: float) -> bool:
        return x == int(x) and -(1 << 29) <= int(x) < (1 << 29)

    if fits_int(v):
        return ((int(v) & 0x3FFFFFFF) << 2) | 0b10
    x100 = v * 100
    if math.isfinite(x100) and abs(x100 - round(x100)) < 1e-9 \
            and fits_int(float(round(x100))):
        return ((int(round(x100)) & 0x3FFFFFFF) << 2) | 0b11
    packed = struct.unpack("<Q", struct.pack("<d", v))[0]
    if packed & ((1 << 34) - 1) == 0:  # low 34 bits must vanish
        return ((packed >> 34) << 2) & 0xFFFFFFFF
    return None


def _rk_decode(rk: int) -> float:
    if rk & 0b10:  # fInt: signed 30-bit
        n = rk >> 2
        if n & (1 << 29):
            n -= 1 << 30
        v = float(n)
    else:
        v = struct.unpack("<d", struct.pack("<Q", (rk >> 2) << 34))[0]
    return v / 100 if rk & 0b01 else v


def _xl_unicode_string(s: str) -> bytes:
    """XLUnicodeRichExtendedString, no rich/phonetic runs; compressed
    (fHighByte=0) when the chars are all Latin-1, UTF-16 otherwise."""
    if all(ord(c) <= 0xFF for c in s):
        return struct.pack("<HB", len(s), 0) + s.encode("latin-1")
    return struct.pack("<HB", len(s), 1) + s.encode("utf-16-le")


def _rec(rid: int, body: bytes) -> bytes:
    if len(body) > 8224:
        raise ValueError("xls: record body exceeds the BIFF8 8224 cap")
    return struct.pack("<HH", rid, len(body)) + body


def _sst_record_bodies(
    strings: list[str], max_body: int, rich_every: int = 0
) -> list[bytes]:
    """The SST record body plus its CONTINUE bodies, per [MS-XLS]
    2.4.265/2.4.58: string HEADERS (cch+flags+cRun) never split across
    a record boundary (the whole header moves to the CONTINUE),
    character data splits only on character boundaries, and every
    fragment that CONTINUES a string's CHARACTER data re-emits a fresh
    option-flags byte whose fHighByte is chosen for THAT fragment's
    characters (real writers recompress, so a UTF-16 string's tail
    continues compressed when its remaining chars fit Latin-1 — and
    vice versa).  With ``rich_every``, every such string carries
    fRichSt FormatRun data (two 4-byte runs) AFTER its characters —
    non-character continuation, which per 2.1.4 does NOT re-emit the
    flags byte."""
    bodies: list[bytearray] = [
        bytearray(struct.pack("<II", len(strings), len(strings)))
    ]

    def append_raw(data: bytes) -> None:
        """Non-character payload: splits anywhere, NO re-emitted
        flags byte on continuation."""
        at = 0
        while at < len(data):
            space = max_body - len(bodies[-1])
            if space == 0:
                bodies.append(bytearray())
                continue
            bodies[-1] += data[at : at + space]
            at += space

    for i, s in enumerate(strings):
        chars = list(s)
        rich = bool(rich_every) and i % rich_every == 2 and chars
        # header (never split): the whole cch+flags[+cRun] moves to
        # the next record when it does not fit with >= 1 char byte
        high = 0 if all(ord(c) <= 0xFF for c in chars) else 1
        header = struct.pack("<HB", len(chars), high | (0x08 if rich else 0))
        if rich:
            header += struct.pack("<H", 2)  # cRun
        if max_body - len(bodies[-1]) < len(header) + 1:
            bodies.append(bytearray())
        bodies[-1] += header
        pos = 0
        first = True
        while pos < len(chars) or (first and not chars):
            if not first:
                # continuation fragment: re-emitted option flags,
                # encoding re-chosen for the remaining characters
                bodies.append(bytearray())
                high = (
                    0 if all(ord(c) <= 0xFF for c in chars[pos:]) else 1
                )
                bodies[-1].append(high)
            first = False
            unit = 2 if high else 1
            space = (max_body - len(bodies[-1])) // unit
            take = min(space, len(chars) - pos)
            if take <= 0 and pos < len(chars):
                continue  # no room for even one char: next fragment
            enc = "utf-16-le" if high else "latin-1"
            bodies[-1] += "".join(chars[pos : pos + take]).encode(enc)
            pos += take
        if rich:
            # two FormatRun structures: (ich, ifnt) each — formatting
            # metadata the text extraction skips
            append_raw(struct.pack("<HHHH", 0, 1, len(chars) // 2, 2))
    return [bytes(b) for b in bodies]


def write_xls(
    strings: list[str], numbers: list[float], sst_max_body: int = 8224,
    rich_every: int = 0,
) -> bytes:
    """A structurally valid BIFF8 .xls Workbook stream inside a CFB:
    globals BOF + SST (+ CONTINUE records per [MS-XLS] when the shared
    string table outgrows one record body — every production-sized
    .xls ships this way), sheet BOF + one LABELSST per string (row k,
    col 0) + one numeric cell per value (row k, col 1) + EOFs.  SST
    strings alternate compressed/UTF-16 storage as their content
    allows, re-chosen per CONTINUE fragment; numerics ship as packed
    RK records whenever RkNumber can represent them (int, x100,
    truncated-double — what real writers emit for most cells) and as
    full 8-byte NUMBER records otherwise.  ``sst_max_body`` lowers the
    8224-byte record cap so tests can force multi-CONTINUE tables from
    small fixtures."""
    wb = bytearray()
    wb += _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0005, 0x0DBB, 0x07CC,
                                 0, 0x0600))
    sst_bodies = _sst_record_bodies(
        strings, min(sst_max_body, 8224), rich_every=rich_every
    )
    wb += _rec(_SST, sst_bodies[0])
    for cont in sst_bodies[1:]:
        wb += _rec(_CONTINUE, cont)
    wb += _rec(_EOF, b"")
    wb += _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0010, 0x0DBB, 0x07CC,
                                 0, 0x0600))
    for k in range(len(strings)):
        wb += _rec(_LABELSST, struct.pack("<HHHI", k, 0, 0, k))
    for k, v in enumerate(numbers):
        rk = _rk_encode(float(v))
        if rk is None:
            wb += _rec(_NUMBER, struct.pack("<HHHd", k, 1, 0, float(v)))
        else:
            wb += _rec(_RK, struct.pack("<HHHI", k, 1, 0, rk))
    wb += _rec(_EOF, b"")
    return write_cfb({"Workbook": bytes(wb)})


def extract_xls_cells(
    blob: bytes,
) -> tuple[list[str], list[float], int]:
    """Walk the Workbook stream's BIFF8 records: SST parsed (both
    fHighByte forms) INCLUDING CONTINUE-split tables — the shape every
    production-sized .xls ships, [MS-XLS] 2.4.58: headers never split,
    character data splits on character boundaries, every continuing
    fragment re-emits its own option-flags byte (so one string may mix
    compressed and UTF-16 storage across fragments).  LABELSST cells
    resolve through the table in record order, numerics from BOTH cell
    forms — packed RK records (int / x100 / truncated-double RkNumber,
    the form real writers emit for most cells) and full NUMBER doubles.
    fRichSt/fExtSt run data is skipped per its header counts; torn
    CONTINUE chains raise ValueError.  Returns (labels, numbers,
    n_rk) with n_rk counting the cells that arrived packed."""
    streams = read_cfb(blob)
    wb = streams.get("Workbook") or streams.get("Book")
    if wb is None:
        raise ValueError("xls: no Workbook stream")
    sst: list[str] = []
    labels: list[str] = []
    numbers: list[float] = []
    n_rk = 0
    p = 0
    while p + 4 <= len(wb):
        rid, ln = struct.unpack_from("<HH", wb, p)
        body = wb[p + 4 : p + 4 + ln]
        if len(body) < ln:
            raise ValueError("xls: truncated record")
        p += 4 + ln
        if rid == _SST:
            fragments = [body]
            while p + 4 <= len(wb):
                nrid, nln = struct.unpack_from("<HH", wb, p)
                if nrid != _CONTINUE:
                    break
                nbody = wb[p + 4 : p + 4 + nln]
                if len(nbody) < nln:
                    raise ValueError("xls: truncated CONTINUE record")
                fragments.append(nbody)
                p += 4 + nln
            sst[:] = _parse_sst(fragments)
            continue
        try:
            _dispatch_xls_record(rid, body, sst, labels, numbers)
        except struct.error as exc:
            raise ValueError(f"xls: truncated record body ({exc})") from exc
        if rid == _RK:
            n_rk += 1
    return labels, numbers, n_rk


def _parse_sst(fragments: list[bytes]) -> list[str]:
    """XLUnicodeRichExtendedString array across the SST record body and
    its CONTINUE bodies ([MS-XLS] 2.4.265 + 2.4.58 + 2.5.293): a string
    whose character data crosses a record boundary resumes after a
    freshly-emitted option-flags byte whose fHighByte is independent of
    the previous fragments' (writers recompress each fragment), while a
    string whose data ENDS at the boundary is followed by the next
    string's ordinary cch+flags header with no extra byte."""
    sst: list[str] = []
    _total, unique = struct.unpack_from("<II", fragments[0], 0)
    fi, q = 0, 8
    for _ in range(unique):
        if q == len(fragments[fi]):
            if fi + 1 >= len(fragments):
                raise ValueError("xls: SST truncated before its strings")
            fi, q = fi + 1, 0
        if len(fragments[fi]) - q < 3:
            # [MS-XLS] forbids splitting the header itself
            raise ValueError("xls: SST string header split by CONTINUE")
        cch, flags = struct.unpack_from("<HB", fragments[fi], q)
        q += 3
        if flags & 0xF2:
            raise ValueError(f"xls: reserved SST flag bits set ({flags:#x})")
        c_run = cb_ext = 0
        if flags & 0x08:  # fRichSt: FormatRun count rides the header
            if len(fragments[fi]) - q < 2:
                raise ValueError("xls: SST string header split by CONTINUE")
            c_run = struct.unpack_from("<H", fragments[fi], q)[0]
            q += 2
        if flags & 0x04:  # fExtSt: ExtRst (phonetic) byte count too
            if len(fragments[fi]) - q < 4:
                raise ValueError("xls: SST string header split by CONTINUE")
            cb_ext = struct.unpack_from("<I", fragments[fi], q)[0]
            q += 4
        high = flags & 0x01
        parts: list[str] = []
        need = cch
        while need:
            if q == len(fragments[fi]):
                if fi + 1 >= len(fragments):
                    raise ValueError(
                        "xls: SST string torn mid-data (CONTINUE missing)"
                    )
                fi, q = fi + 1, 0
                # the continuing fragment re-emits option flags
                high = fragments[fi][q] & 0x01
                q += 1
                continue
            unit = 2 if high else 1
            avail = (len(fragments[fi]) - q) // unit
            if avail == 0:
                raise ValueError("xls: SST splits a UTF-16 code unit")
            take = min(need, avail)
            raw = fragments[fi][q : q + take * unit]
            parts.append(
                raw.decode("utf-16-le" if high else "latin-1")
            )
            q += take * unit
            need -= take
        # rich-run + ExtRst data trail the characters: formatting
        # metadata, skipped — NON-character continuation, so no
        # re-emitted flags byte when it splits ([MS-XLS] 2.1.4)
        skip = c_run * 4 + cb_ext
        while skip:
            if q == len(fragments[fi]):
                if fi + 1 >= len(fragments):
                    raise ValueError(
                        "xls: SST rich/phonetic data torn "
                        "(CONTINUE missing)"
                    )
                fi, q = fi + 1, 0
                continue
            step = min(skip, len(fragments[fi]) - q)
            q += step
            skip -= step
        sst.append("".join(parts))
    return sst


def _dispatch_xls_record(rid, body, sst, labels, numbers) -> None:
        if rid == _LABELSST:
            isst = struct.unpack_from("<I", body, 6)[0]
            if isst >= len(sst):
                raise ValueError(f"xls: LABELSST index {isst} out of range")
            labels.append(sst[isst])
        elif rid == _NUMBER:
            numbers.append(struct.unpack_from("<d", body, 6)[0])
        elif rid == _RK:
            numbers.append(_rk_decode(struct.unpack_from("<I", body, 6)[0]))


# ------------------------------------------------ [MS-PPT] text atoms

_PPT_DOCUMENT = 0x03E8        # DocumentContainer
_PPT_SLIDE_LIST = 0x0FF0      # SlideListWithTextContainer
_PPT_TEXT_CHARS = 0x0FA0      # TextCharsAtom (UTF-16LE)
_PPT_TEXT_BYTES = 0x0FA8      # TextBytesAtom (low bytes of UTF-16)


def _ppt_record(rec_type: int, body: bytes, rec_ver: int = 0,
                rec_instance: int = 0) -> bytes:
    """One [MS-PPT] record: 8-byte header (recVer/recInstance packed
    little-endian, recType, recLen) + body.  Containers use
    recVer = 0xF per spec."""
    vi = (rec_instance << 4) | (rec_ver & 0xF)
    return struct.pack("<HHI", vi, rec_type, len(body)) + body


def write_ppt(slides: list[list[str]]) -> bytes:
    """A structurally valid PowerPoint 97-2003 .ppt: the PowerPoint
    Document stream holds a DocumentContainer whose
    SlideListWithTextContainer carries one text atom per paragraph —
    TextCharsAtom (UTF-16) when the text needs it, TextBytesAtom
    (the 8-bit form real decks mostly use) otherwise, so readers must
    handle both.  ``slides`` is a list of paragraph lists."""
    atoms = bytearray()
    for slide in slides:
        for para in slide:
            if all(ord(c) <= 0xFF for c in para):
                atoms += _ppt_record(
                    _PPT_TEXT_BYTES, para.encode("latin-1"))
            else:
                atoms += _ppt_record(
                    _PPT_TEXT_CHARS, para.encode("utf-16-le"))
    slw = _ppt_record(_PPT_SLIDE_LIST, bytes(atoms), rec_ver=0xF)
    doc = _ppt_record(_PPT_DOCUMENT, slw, rec_ver=0xF)
    return write_cfb({
        "PowerPoint Document": doc,
        "\x05SummaryInformation": b"\xfe\xff\x00\x00",
    })


def extract_ppt_text(blob: bytes) -> list[str]:
    """Recover the text atoms of a PowerPoint 97-2003 deck in record
    order: walk the PowerPoint Document stream's record tree
    (containers are recVer 0xF and recurse; atoms are leaves), decode
    TextCharsAtom as UTF-16LE and TextBytesAtom as the low bytes of
    UTF-16 code units (latin-1 semantics per [MS-PPT] §2.9).  Raises
    ValueError on torn records (declared length past the scope)."""
    streams = read_cfb(blob)
    ppt = streams.get("PowerPoint Document")
    if ppt is None:
        raise ValueError("ppt: no PowerPoint Document stream")
    out: list[str] = []

    def walk(lo: int, hi: int, depth: int = 0) -> None:
        if depth > 32:
            raise ValueError("ppt: record tree too deep")
        pos = lo
        while pos < hi:
            if pos + 8 > hi:
                raise ValueError("ppt: record header runs past scope")
            vi, rtype, rlen = struct.unpack_from("<HHI", ppt, pos)
            body_lo = pos + 8
            body_hi = body_lo + rlen
            if body_hi > hi:
                raise ValueError(
                    f"ppt: record 0x{rtype:04x} runs past its scope"
                )
            if vi & 0xF == 0xF:          # container: recurse
                walk(body_lo, body_hi, depth + 1)
            elif rtype == _PPT_TEXT_CHARS:
                if rlen % 2:
                    raise ValueError("ppt: odd TextCharsAtom length")
                out.append(ppt[body_lo:body_hi].decode("utf-16-le"))
            elif rtype == _PPT_TEXT_BYTES:
                out.append(ppt[body_lo:body_hi].decode("latin-1"))
            pos = body_hi

    walk(0, len(ppt))
    return out


# --------------------------------------------- [MS-OXMSG] Outlook .msg

_MSG_SUBJECT = 0x0037
_MSG_BODY = 0x1000
_MSG_SENDER = 0x0C1A
_MSG_RCPT_NAME = 0x3001
_MSG_RCPT_EMAIL = 0x3003
_MSG_ATT_NAME = 0x3704
_MSG_ATT_DATA = 0x3701


def _substg(prop: int, value) -> tuple[str, bytes]:
    """One __substg1.0_PPPPTTTT stream: UTF-16 strings type 001F,
    8-bit strings 001E (the pre-Unicode form old mail carries),
    binary 0102."""
    if isinstance(value, bytes):
        return f"__substg1.0_{prop:04X}0102", value
    if all(ord(c) < 128 for c in value):
        return f"__substg1.0_{prop:04X}001E", value.encode("ascii")
    return f"__substg1.0_{prop:04X}001F", value.encode("utf-16-le")


def write_msg(
    subject: str,
    body: str,
    sender: str,
    recipients: list[tuple[str, str]],
    attachments: list[tuple[str, bytes]] | None = None,
) -> bytes:
    """A structurally valid Outlook .msg: top-level property streams
    plus one STORAGE per recipient (__recip_version1.0_#NNNNNNNN) and
    attachment (__attach_version1.0_#NNNNNNNN) — the nested-directory
    layout is the format, not an embellishment.  String properties mix
    the 001E (8-bit) and 001F (UTF-16) forms by content, so readers
    must dispatch on the type suffix."""
    streams: dict[str, bytes] = {}
    for prop, val in ((_MSG_SUBJECT, subject), (_MSG_BODY, body),
                      (_MSG_SENDER, sender)):
        name, data = _substg(prop, val)
        streams[name] = data
    streams["__properties_version1.0"] = b"\x00" * 32
    for i, (rname, email) in enumerate(recipients):
        base = f"__recip_version1.0_#{i:08X}"
        for prop, val in ((_MSG_RCPT_NAME, rname),
                          (_MSG_RCPT_EMAIL, email)):
            name, data = _substg(prop, val)
            streams[f"{base}/{name}"] = data
    for i, (fname, payload) in enumerate(attachments or []):
        base = f"__attach_version1.0_#{i:08X}"
        name, data = _substg(_MSG_ATT_NAME, fname)
        streams[f"{base}/{name}"] = data
        streams[f"{base}/__substg1.0_{_MSG_ATT_DATA:04X}0102"] = payload
    return write_cfb(streams)


def _msg_prop(streams: dict, prefix: str, prop: int):
    for suffix, dec in (("001F", "utf-16-le"), ("001E", "ascii")):
        key = f"{prefix}__substg1.0_{prop:04X}{suffix}"
        if key in streams:
            return streams[key].decode(dec)
    return None


def extract_msg(blob: bytes) -> dict:
    """Recover an Outlook .msg's text surface: subject, body, sender
    (both string-property forms handled), recipient (name, email)
    pairs from their storages in index order, attachment
    (filename, byte count) pairs likewise.  A message with no body
    property raises — silently empty mail is how extraction bugs
    hide."""
    streams = read_cfb(blob)
    body = _msg_prop(streams, "", _MSG_BODY)
    if body is None:
        raise ValueError("msg: no body property stream")
    out = {
        "subject": _msg_prop(streams, "", _MSG_SUBJECT),
        "body": body,
        "sender": _msg_prop(streams, "", _MSG_SENDER),
        "recipients": [],
        "attachments": [],
    }
    rids = sorted(
        {p.split("/")[0] for p in streams if p.startswith("__recip_")}
    )
    for rid in rids:
        out["recipients"].append(
            (
                _msg_prop(streams, rid + "/", _MSG_RCPT_NAME),
                _msg_prop(streams, rid + "/", _MSG_RCPT_EMAIL),
            )
        )
    aids = sorted(
        {p.split("/")[0] for p in streams if p.startswith("__attach_")}
    )
    for aid in aids:
        data = streams.get(
            aid + f"/__substg1.0_{_MSG_ATT_DATA:04X}0102", b""
        )
        out["attachments"].append(
            (_msg_prop(streams, aid + "/", _MSG_ATT_NAME), len(data))
        )
    return out
