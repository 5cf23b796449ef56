"""Interpret-vs-Mosaic dispatch for the Pallas kernels.

Every kernel in this package runs in interpret mode on the CPU backend (the
8-device host mesh used by tests) and as a real Mosaic kernel on TPU. That
choice used to key on ``jax.default_backend()`` alone — which is "cpu" during
the *chipless AOT* flow (``tools/aot_compile_check.py`` lowers for a v5e
topology while the default platform is pinned to cpu), so AOT checks were
silently compiling the interpret emulation instead of validating Mosaic.

``TFCGAN_PALLAS_INTERPRET`` overrides the automatic choice:
  - unset / "auto": interpret iff the default backend is cpu,
  - "0"/"false":    always Mosaic (set by the AOT tools),
  - "1"/"true":     always interpret.
"""

from __future__ import annotations

import os

import jax


def default_interpret() -> bool:
    env = os.environ.get("TFCGAN_PALLAS_INTERPRET", "auto").lower()
    if env in ("auto", ""):
        return jax.default_backend() == "cpu"
    return env not in ("0", "false")
