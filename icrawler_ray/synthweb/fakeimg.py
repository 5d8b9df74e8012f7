"""Deterministic fake image codec.

PIL is not installed in this container, so the image-decode step of the
download path (/root/reference/icrawler/downloader.py:253-258 uses
``PIL.Image.open``) is served by this stub format:

    b"FIMG" + width:uint32le + height:uint32le + payload bytes

``decode_size`` returns (w, h) or None for undecodable bodies — the same
contract the PIL path has (OSError -> reject,
/root/reference/icrawler/downloader.py:254-256). When PIL *is* available
(real deployments), ``decode_size`` transparently falls through to it, so
the Ray-side plumbing (actor signature, schema, keep_file gates) is real
and identical in both modes.
"""

from __future__ import annotations

import struct

MAGIC = b"FIMG"

try:  # pragma: no cover - not present in this sandbox
    from io import BytesIO

    from PIL import Image  # type: ignore

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def encode(width: int, height: int, payload: bytes = b"") -> bytes:
    return MAGIC + struct.pack("<II", width, height) + payload


def decode_size(content: bytes):
    """(width, height) of an image body, or None if undecodable."""
    if content[:4] == MAGIC and len(content) >= 12:
        w, h = struct.unpack("<II", content[4:12])
        return (int(w), int(h))
    if _HAVE_PIL:  # pragma: no cover
        try:
            img = Image.open(BytesIO(content))
            return img.size
        except OSError:
            return None
    return None
