"""Buffered / gzip-capable file IO helpers (ref: utilities/FileUtils.java:~10)."""

from __future__ import annotations

import gzip
import os


def open_text(path: str, mode: str = "rt"):
    """Open *path* as text; transparently handles ``.gz`` files."""
    if path.endswith(".gz"):
        return gzip.open(path, mode if "t" in mode else mode + "t")
    return open(path, mode)


def read_lines(path: str):
    with open_text(path) as f:
        for line in f:
            yield line.rstrip("\n")


def write_text(path: str, content: str) -> None:
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(path, "w") as f:
        f.write(content)


def file_name(path: str) -> str:
    """Basename helper (ref: FileUtils.getFileName)."""
    return os.path.basename(path)


def list_files(directory: str):
    """Sorted regular files in a directory (ref: FileUtils directory listing,
    used by Analyzer and Combiner)."""
    return sorted(
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if os.path.isfile(os.path.join(directory, f))
    )
