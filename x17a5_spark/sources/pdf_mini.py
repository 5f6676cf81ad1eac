"""Dependency-free first-N-pages PDF slicer for the simple subset
(classic xref table, uncompressed object graph, single /Pages node —
the shape the reference's filings mostly are, and exactly what
tests/test_sources_extra.py::_minimal_pdf writes).

This is the fallback engine for sources/binary_docs.slice_pages
(reference FocusReportSlicing.py:78-109) when pypdf is absent from the
container. Anything outside the supported subset (cross-reference
streams, incremental updates, nested page trees, non-contiguous object
numbering) returns ``None`` and the caller passes the document through
untouched — the same contract as the old import-try.

Pure bytes-in/bytes-out, so it runs unchanged inside the executors'
``mapInPandas`` batches.
"""

from __future__ import annotations

import re

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.DOTALL)
_ROOT_RE = re.compile(rb"/Root\s+(\d+)\s+\d+\s+R")
_PAGES_RE = re.compile(rb"/Pages\s+(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.DOTALL)
_COUNT_RE = re.compile(rb"/Count\s+(\d+)")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")


def slice_pdf_first_pages(content: bytes, max_pages: int) -> bytes | None:
    """Return a valid PDF holding only the first ``max_pages`` pages,
    the original bytes if it already has <= max_pages, or ``None`` when
    the structure is outside the supported subset."""
    if not content.startswith(b"%PDF"):
        return None
    objs = {int(m.group(1)): m.group(3).strip() for m in _OBJ_RE.finditer(content)}
    if not objs:
        return None
    # stream objects can contain binary runs that alias the regexes
    # above (and compressed page trees always do) — out of subset
    if any(b"stream" in body for body in objs.values()):
        return None
    root_m = _ROOT_RE.search(content)
    if root_m is None or int(root_m.group(1)) not in objs:
        return None
    catalog = objs[int(root_m.group(1))]
    pages_m = _PAGES_RE.search(catalog)
    if pages_m is None or int(pages_m.group(1)) not in objs:
        return None
    pages_num = int(pages_m.group(1))
    pages_body = objs[pages_num]
    kids_m = _KIDS_RE.search(pages_body)
    count_m = _COUNT_RE.search(pages_body)
    if kids_m is None or count_m is None:
        return None
    kids = _REF_RE.findall(kids_m.group(1))
    # nested page trees (a kid that is itself a /Pages node) are out of
    # subset — /Count would no longer equal len(kids)
    if len(kids) != int(count_m.group(1)):
        return None
    if len(kids) <= max_pages:
        return content
    kept = kids[:max_pages]
    new_kids = b"/Kids [" + b" ".join(k + b" 0 R" for k in kept) + b"]"
    new_body = _KIDS_RE.sub(
        lambda _: new_kids,
        _COUNT_RE.sub(b"/Count " + str(len(kept)).encode(), pages_body),
        count=1,
    )
    objs[pages_num] = new_body
    # rebuild with a classic contiguous xref; dropped pages' objects are
    # simply left out, other unreferenced objects harmlessly retained
    dropped = {int(k) for k in kids[max_pages:]}
    nums = sorted(n for n in objs if n not in dropped)
    if nums != list(range(1, len(nums) + 1)):
        # renumber to stay contiguous (classic single-section xref)
        remap = {old: new for new, old in enumerate(nums, start=1)}

        def _renum(m: re.Match) -> bytes:
            old = int(m.group(1))
            return (str(remap[old]).encode() + b" 0 R") if old in remap else m.group(0)

        objs = {
            remap[n]: _REF_RE.sub(_renum, objs[n]) for n in nums
        }
        root_num = remap[int(root_m.group(1))]
        nums = sorted(objs)
    else:
        objs = {n: objs[n] for n in nums}
        root_num = int(root_m.group(1))

    out = b"%PDF-1.4\n"
    offsets = []
    for n in nums:
        offsets.append(len(out))
        out += str(n).encode() + b" 0 obj\n" + objs[n] + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(nums) + 1).encode() + b"\n0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(nums) + 1).encode()
        + b" /Root " + str(root_num).encode() + b" 0 R >>\n"
        + b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return out


def count_pages(content: bytes) -> int | None:
    """Page count for the same simple subset (None when unsupported) —
    an independent structural check for tests."""
    objs = {int(m.group(1)): m.group(3) for m in _OBJ_RE.finditer(content)}
    root_m = _ROOT_RE.search(content)
    if root_m is None or int(root_m.group(1)) not in objs:
        return None
    pages_m = _PAGES_RE.search(objs[int(root_m.group(1))])
    if pages_m is None or int(pages_m.group(1)) not in objs:
        return None
    count_m = _COUNT_RE.search(objs[int(pages_m.group(1))])
    return int(count_m.group(1)) if count_m else None
