"""Recipe protocol shared by all GAN experiment families.

A recipe owns the flax modules and exposes pure loss functions; the generic
trainer (``tfcgan_tpu.train.trainer``) differentiates and applies them inside
one jitted alternating G/D step. State layout:

- ``g_params``   — every parameter updated by the generator optimizer (the
  reference sometimes chains several modules into one Adam, e.g. G1+G2+STN,
  ``TFC-STN/...Official.py:560``).
- ``d_params`` / ``spectral`` — discriminator parameters + spectral-norm
  power-iteration state.
- ``frozen``     — non-trained parameters (LPIPS backbone).

``g_loss`` returns ``(loss, (aux, metrics))`` where ``aux`` carries the
generated images reused (stop-gradient) by ``d_loss`` — mirroring the
reference's ``fake_B.detach()`` reuse without a second G forward.
"""

from __future__ import annotations

from typing import Any, Protocol

import jax

Batch = dict[str, jax.Array]
Params = Any


class GANRecipe(Protocol):
    name: str

    def init(self, key: jax.Array, batch: Batch) -> dict[str, Params]:
        """Returns {"g_params", "d_params", "spectral", "frozen"}."""
        ...

    def g_loss(
        self,
        g_params: Params,
        d_params: Params,
        spectral: Params,
        frozen: Params,
        batch: Batch,
        rng: jax.Array,
    ) -> tuple[jax.Array, tuple[dict, dict]]:
        ...

    def d_loss(
        self,
        d_params: Params,
        spectral: Params,
        aux: dict,
        batch: Batch,
        rng: jax.Array,
    ) -> tuple[jax.Array, dict]:
        ...
