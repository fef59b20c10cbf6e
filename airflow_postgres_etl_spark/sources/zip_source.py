"""Zip extraction pre-step (reference S5, ``initial-script/extract-zip.py``).

Spark has no zip source; like the reference this is an out-of-band driver
step.  At scale the archive expansion belongs upstream of the lake (object
store unpack); this utility exists for workflow parity."""

from __future__ import annotations

import os
import zipfile


def extract_zip(zip_path: str, dest_dir: str) -> list[str]:
    """Extract ``zip_path`` into ``dest_dir``; returns extracted names.

    Rejects entries that would escape ``dest_dir`` (zip-slip)."""
    os.makedirs(dest_dir, exist_ok=True)
    out: list[str] = []
    with zipfile.ZipFile(zip_path) as zf:
        for info in zf.infolist():
            target = os.path.realpath(os.path.join(dest_dir, info.filename))
            if not target.startswith(os.path.realpath(dest_dir) + os.sep):
                raise ValueError(f"zip entry escapes destination: {info.filename}")
            zf.extract(info, dest_dir)
            out.append(info.filename)
    return out
