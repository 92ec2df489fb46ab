"""Collision-safe file identifiers for the file sources.

Every file source keys its output rows by a file id that downstream
pipelines treat as the conversation id (``extract_pages_pipeline``:
conv=file, turn=page). A bare ``os.path.basename`` id collapses two
input files with the same basename in different directories into one
conv_id — their pages interleave and cross-file dedup/segmentation
silently merge them (ADVICE round 2). The id therefore carries a short
stable hash of the full path alongside the readable basename.
"""

from __future__ import annotations

import os
import zlib


def file_id(path: str) -> str:
    """``{basename}#{crc32(abspath):08x}`` — readable, deterministic
    across processes, and unique per distinct input path."""
    p = os.path.abspath(path)
    return f"{os.path.basename(p)}#{zlib.crc32(p.encode('utf-8')):08x}"
