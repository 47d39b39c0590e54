"""Shared frontend I/O helpers."""
from __future__ import annotations

import gzip


def open_text(path):
    """Open a text file, transparently decompressing ``.gz``."""
    if str(path).endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "r")
