"""Structured metric logging.

Replaces the reference's ``\\r``-overwritten stdout line + append-only text
logs (``TFCGAN_multigpu_globalFFT.py:546-582``) with JSONL records (one dict
per line) plus an optional human-readable console line.
"""

from __future__ import annotations

import json
import os
import sys
import time


class JsonlLogger:
    def __init__(self, path: str | None = None, echo: bool = True):
        self.path = path
        self.echo = echo
        self._fh = None
        if path is not None:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a")

    def write(self, record: dict) -> None:
        record = {"ts": time.time(), **record}
        if self._fh is not None:
            self._fh.write(json.dumps(record) + "\n")
            self._fh.flush()
        if self.echo:
            parts = [
                f"{k}: {v:.4f}" if isinstance(v, float) else f"{k}: {v}"
                for k, v in record.items()
                if k != "ts"
            ]
            sys.stdout.write("\r" + " | ".join(parts))
            sys.stdout.flush()

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
