"""Misc filesystem helpers (reference videoswap/utils/misc.py:6-56)."""

from __future__ import annotations

import os
import zipfile
from pathlib import Path
from typing import Iterator


def scandir(dir_path: str, suffix: str | tuple | None = None,
            recursive: bool = False, full_path: bool = False
            ) -> Iterator[str]:
    """Yield file paths under dir_path, optionally filtered by suffix."""
    root = dir_path

    def _scan(d):
        for entry in os.scandir(d):
            if entry.name.startswith('.'):
                continue
            if entry.is_file():
                rel = (entry.path if full_path
                       else os.path.relpath(entry.path, root))
                if suffix is None or rel.endswith(suffix):
                    yield rel
            elif recursive and entry.is_dir():
                yield from _scan(entry.path)

    return _scan(dir_path)


def zip_dir(dir_path: str, out_path: str) -> None:
    """Zip a directory tree (reference zipDir)."""
    with zipfile.ZipFile(out_path, 'w', zipfile.ZIP_DEFLATED) as zf:
        for p in Path(dir_path).rglob('*'):
            if p.is_file():
                zf.write(p, p.relative_to(dir_path))
