"""Atomic full-state checkpointing via Orbax.

The reference saves per-module ``.pth`` files with DataParallel ``module.``
prefixes that inference must strip (``test_TFCGAN.py:125-135``), and loses
optimizer/RNG state on resume. Here one checkpoint = the whole
``GANTrainState`` pytree (params, both optimizer states, spectral state, PRNG
key, step), saved atomically, restored onto any mesh layout.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from tfcgan_tpu.train.state import GANTrainState


def save_checkpoint(ckpt_dir: str, state: GANTrainState, step: int | None = None) -> str:
    step = int(state.step) if step is None else step
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    if os.path.isdir(path):  # idempotent: this step is already on disk
        return path
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state))
    ckptr.wait_until_finished()
    return path


class AsyncCheckpointManager:
    """Non-blocking checkpointing: ``save`` returns as soon as the state is
    snapshotted off-device; serialization/IO overlaps the next train steps
    (the reference's ``torch.save`` blocks the loop for the full write).

    One in-flight save at a time: a new ``save`` first waits for the previous
    one (back-to-back saves degrade to sync rather than queueing unboundedly).
    Call ``wait`` before exiting or measuring step time.
    """

    def __init__(self, ckpt_dir: str):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, state: GANTrainState, step: int | None = None) -> str:
        step = int(state.step) if step is None else step
        path = os.path.join(self.ckpt_dir, f"step_{step:08d}")
        self._ckptr.wait_until_finished()  # before isdir: commits in-flight
        if os.path.isdir(path):  # idempotent: this step is already on disk
            return path
        self._ckptr.save(path, args=ocp.args.StandardSave(jax.device_get(state)))
        return path

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._ckptr.close()


def restore_checkpoint(path: str, template: GANTrainState) -> GANTrainState:
    """Restore into the structure/shardings of ``template``."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    return os.path.join(os.path.abspath(ckpt_dir), steps[-1]) if steps else None
