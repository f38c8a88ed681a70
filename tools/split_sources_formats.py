"""One-shot mechanical splitter for queries/sources_formats.py (r12
verdict #6): slice the 10.6k-line monolith into CONTIGUOUS per-family
segment modules imported in order by the (now thin) sources_formats
facade, so the global registration order — and therefore the driver's
verification rotation and every plan-lock — stays byte-identical.
Cross-segment references resolve via explicit backward imports; any
FORWARD reference is reported loudly for a hand fix (none expected in
an append-only file).  The facade re-exports every top-level name so
``from ...sources_formats import X`` keeps working for tests, tools,
and sibling query modules."""

from __future__ import annotations

import ast
import builtins
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "etl_pipeline_old_spark", "queries", "sources_formats.py")

# segment name -> the register() query whose definition STARTS it
BOUNDARIES = [
    ("formats_media", "s12_orc_roundtrip"),
    ("formats_audio", "multimodal_g711_ingest"),
    ("formats_containers", "multimodal_webp_probe"),
    ("formats_pdf", "pipeline_pdf_extract"),
    ("formats_video_text", "multimodal_webm_probe"),
    ("formats_office", "pipeline_docx_extract"),
    ("formats_web", "web_robots_gate"),
    ("formats_lake", "multimodal_avro_ingest"),
]

HEADER = '''"""{title} — a contiguous slice of the former
queries/sources_formats.py monolith (split r13, r12 verdict #6).  The
sources_formats facade imports the slices IN ORDER, so global registry
order is byte-identical to the pre-split file; see that module's
docstring for the family story."""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ...workdir import cache_root
from ...catalog import load_table
from ...registry import register
'''


def stmt_span(node) -> tuple[int, int]:
    start = node.lineno
    for dec in getattr(node, "decorator_list", []) or []:
        start = min(start, dec.lineno)
    return start, node.end_lineno


def defined_names(node) -> set:
    out = set()
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        out.add(node.name)
    elif isinstance(node, ast.Assign):
        for t in node.targets:
            if isinstance(t, ast.Name):
                out.add(t.id)
            elif isinstance(t, (ast.Tuple, ast.List)):
                out |= {e.id for e in t.elts if isinstance(e, ast.Name)}
    elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
        out.add(node.target.id)
    elif isinstance(node, (ast.Import, ast.ImportFrom)):
        for a in node.names:
            out.add((a.asname or a.name).split(".")[0])
    return out


def register_name(node):
    if not isinstance(node, ast.FunctionDef):
        return None
    for dec in node.decorator_list:
        if (isinstance(dec, ast.Call) and isinstance(dec.func, ast.Name)
                and dec.func.id == "register" and dec.args
                and isinstance(dec.args[0], ast.Constant)):
            return dec.args[0].value
    return None


def main() -> None:
    text = open(SRC, encoding="utf-8").read()
    lines = text.splitlines(keepends=True)
    tree = ast.parse(text)
    stmts = tree.body

    # find segment start statement indexes
    starts = {}
    for i, st in enumerate(stmts):
        rn = register_name(st)
        for seg, q in BOUNDARIES:
            if rn == q:
                starts[seg] = i
    missing = [q for s, q in BOUNDARIES if s not in starts]
    assert not missing, f"boundary queries not found: {missing}"
    order = [s for s, _ in BOUNDARIES]
    assert [starts[s] for s in order] == sorted(starts[s] for s in order)

    # common = statements before the first boundary that are imports or
    # the module docstring; helpers before the first boundary go to the
    # first segment
    first = starts[order[0]]
    seg_of: list[str] = []
    for i, st in enumerate(stmts):
        if i < first:
            seg_of.append("__common__")
        else:
            cur = max((s for s in order if starts[s] <= i),
                      key=lambda s: starts[s])
            seg_of.append(cur)

    # per-segment defined names
    defs: dict[str, set] = {}
    for i, st in enumerate(stmts):
        defs.setdefault(seg_of[i], set()).update(defined_names(st))

    header_defs = set()
    header_tree = ast.parse(HEADER.format(title="x"))
    for st in header_tree.body:
        header_defs |= defined_names(st)
    common_defs = defs.get("__common__", set()) | header_defs
    bset = set(dir(builtins))

    # per-segment referenced global-ish names (overapproximation)
    refs: dict[str, set] = {s: set() for s in order}
    for i, st in enumerate(stmts):
        if seg_of[i] == "__common__":
            continue
        for n in ast.walk(st):
            if isinstance(n, ast.Name):
                refs[seg_of[i]].add(n.id)

    # resolve cross-segment imports (backward only)
    seg_imports: dict[str, dict[str, list]] = {s: {} for s in order}
    forward = []
    for si, seg in enumerate(order):
        need = refs[seg] - defs.get(seg, set()) - common_defs - bset
        for name in sorted(need):
            owner = None
            for so, other in enumerate(order):
                if name in defs.get(other, set()):
                    owner = (so, other)
                    break
            if owner is None:
                continue  # local var / param overapproximation
            if owner[0] > si:
                forward.append((seg, name, owner[1]))
            elif owner[1] != seg:
                seg_imports[seg].setdefault(owner[1], []).append(name)

    if forward:
        print("FORWARD REFERENCES (hand-fix needed):")
        for seg, name, owner in forward:
            print(f"  {seg} uses {name} defined later in {owner}")
        sys.exit(1)

    # common block text (docstring+imports before first boundary,
    # excluding helper defs which go to segment 1 — actually everything
    # before the first boundary that is NOT an import/docstring belongs
    # to segment 1)
    seg_text: dict[str, list] = {s: [] for s in order}
    common_tail = []  # helper statements before first boundary
    for i, st in enumerate(stmts):
        a, b = stmt_span(st)
        chunk = "".join(lines[a - 1 : b])
        if seg_of[i] == "__common__":
            if isinstance(st, (ast.Import, ast.ImportFrom)) or (
                isinstance(st, ast.Expr) and isinstance(st.value, ast.Constant)
            ):
                continue  # replaced by HEADER in each segment
            common_tail.append(chunk)
        else:
            seg_text[seg_of[i]].append(chunk)
    # helpers defined before the first boundary live in segment 1
    seg_text[order[0]] = common_tail + seg_text[order[0]]
    # their names count as segment-1 defs for the facade export
    defs[order[0]] |= defs.get("__common__", set()) - header_defs

    titles = {
        "formats_media": "Tabular format roundtrips + raster image ingestion",
        "formats_audio": "Audio/video media ingestion (G.711, ADPCM, FLAC, motion)",
        "formats_containers": "Container probes and archive shards (WebP, AAC, EXIF, Ogg, ZIP)",
        "formats_pdf": "PDF document extraction (text, encryption, xref streams, images)",
        "formats_video_text": "Caption tracks and video-text pair corpora",
        "formats_office": "Office/ebook/mail/code document extraction",
        "formats_web": "Web REP surfaces, corpus hygiene, BSON shards",
        "formats_lake": "Lake interchange formats (Avro, SQLite) and de-markup",
    }
    outdir = os.path.join(ROOT, "etl_pipeline_old_spark", "queries", "formats")
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "__init__.py"), "w", encoding="utf-8") as fh:
        fh.write(
            '"""Per-family slices of the former sources_formats.py '
            "monolith.\nImported IN ORDER by the sources_formats facade "
            '— never directly by\nload_all — so registry order is '
            'unchanged."""\n'
        )
    for seg in order:
        path = os.path.join(outdir, seg + ".py")
        parts = [HEADER.format(title=titles[seg])]
        for other, names in sorted(seg_imports[seg].items()):
            uniq = sorted(set(names))
            parts.append(
                "from .{} import (  # noqa: F401 — shared helpers\n    {},\n)\n".format(
                    other, ",\n    ".join(uniq)
                )
            )
        parts.append("\n")
        import re as _re

        # segments live one package DEEPER than the monolith did:
        # every relative import in the sliced text gains one dot
        sliced = "".join(seg_text[seg])
        sliced = _re.sub(r"\bfrom (\.+)", lambda m: "from ." + m.group(1),
                         sliced)
        body = "\n".join(parts) + sliced
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(body)
        print(f"wrote {path} ({body.count(chr(10))} lines)")

    # facade
    doc_end = stmts[0].end_lineno if isinstance(stmts[0], ast.Expr) else 0
    facade = "".join(lines[:doc_end])
    facade += (
        "\n# Split r13 (r12 verdict #6): the families now live in the\n"
        "# queries/formats/ package, imported HERE in the original file\n"
        "# order so the registry's insertion order is byte-identical to\n"
        "# the pre-split monolith.  Every top-level name is re-exported\n"
        "# so `from ...sources_formats import X` keeps working.\n\n"
        "from __future__ import annotations\n\n"
    )
    for seg in order:
        names = sorted(defs.get(seg, set()))
        facade += "from .formats.{} import (  # noqa: F401\n    {},\n)\n".format(
            seg, ",\n    ".join(names)
        )
    with open(SRC, "w", encoding="utf-8") as fh:
        fh.write(facade)
    print(f"rewrote facade {SRC} ({facade.count(chr(10))} lines)")


if __name__ == "__main__":
    main()
