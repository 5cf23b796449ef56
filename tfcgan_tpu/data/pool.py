"""Device-resident training pool — the TPU-native input path for
fits-in-HBM datasets.

The reference re-decodes and re-ships every image every epoch through
``DataLoader(num_workers=...)`` (``/root/reference/TFC-GAN-FFT/
TFCGAN_multigpu_globalFFT.py:393-409``). That design is wrong for TPU at
this dataset scale: the headline sets are a few thousand 256² pairs
(Eurecom/Devcom, SURVEY.md §6) — 100–800 MB as uint8 against 16 GB of HBM —
while the per-step host hop costs 2 s/batch over a tunneled chip and the
host decode sustains ~20 img/s against a chip that consumes 264.

``DevicePool`` stages the whole decoded dataset into HBM ONCE as uint8
(4× smaller than fp32), then each step gathers its batch and applies
normalization + the temperature LUT *on device* inside one jitted function
with mesh-sharded outputs: zero host work and zero transfer in steady state.
Batch order reproduces ``pairs.batch_iterator`` (seeded shuffle, drop_last),
and the emitted values match the host pipeline's float path to 1 fp32 ulp
(XLA reassociates the affine normalize).
"""

from __future__ import annotations

from functools import partial
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from tfcgan_tpu.ops.temperature import TEMP_MAX_C, TEMP_MIN_C
from tfcgan_tpu.parallel.mesh import image_sharding, replicated_sharding


def _decode_all(dataset, log_every: int = 0) -> dict[str, np.ndarray]:
    """One decode pass over ``dataset`` -> stacked uint8 arrays (+labels)."""
    items = []
    for i in range(len(dataset)):
        items.append(dataset.raw_item(i))
        if log_every and (i + 1) % log_every == 0:
            print(f"pool decode {i + 1}/{len(dataset)}")
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


class DevicePool:
    """HBM-staged uint8 dataset with on-device batch assembly.

    ``arrays`` may be passed directly ({"A_u8": (N,H,W,3) u8, "B_u8": ...,
    optional "LAB3"/"LAB"}) to skip the decode pass (tests, synthetic data).
    """

    def __init__(self, dataset=None, mesh=None, *, arrays=None, log_every: int = 0):
        if mesh is None:
            from tfcgan_tpu.parallel.mesh import make_mesh

            mesh = make_mesh()
        self.mesh = mesh
        host = arrays if arrays is not None else _decode_all(dataset, log_every)
        assert host["A_u8"].dtype == np.uint8 and host["B_u8"].dtype == np.uint8
        # the pool lives replicated: a few hundred MB against 16 GB HBM, and
        # replication lets every device gather its batch shard locally with
        # no cross-device traffic
        rep = replicated_sharding(mesh)
        self._pool = {k: jax.device_put(v, rep) for k, v in host.items()}
        self.n = int(host["A_u8"].shape[0])
        self._assemble = self._build_assemble()

    def assemble_pure(self, pool, idx):
        """Pure gather+normalize, usable standalone (jitted below) or INSIDE
        another jitted program (``Trainer.fit(pool=...)`` fuses it into the
        train step so each step is ONE dispatch)."""
        has_lab3 = "LAB3" in self._pool
        has_lab = "LAB" in self._pool
        a_u8 = jnp.take(pool["A_u8"], idx, axis=0)
        b_u8 = jnp.take(pool["B_u8"], idx, axis=0)
        # pairs._normalize formula: (u8/255 - .5)/.5 (XLA may reassociate)
        norm = lambda u: (u.astype(jnp.float32) / 255.0 - 0.5) / 0.5
        t_b = TEMP_MIN_C + b_u8[..., 0].astype(jnp.float32) * (
            (TEMP_MAX_C - TEMP_MIN_C) / 255.0
        )
        out = {"A": norm(a_u8), "B": norm(b_u8), "T_B": t_b}
        if has_lab3:
            out["LAB3"] = jnp.take(pool["LAB3"], idx, axis=0)
        if has_lab:
            out["LAB"] = jnp.take(pool["LAB"], idx, axis=0)
        return out

    @property
    def arrays(self) -> dict[str, jax.Array]:
        """The staged uint8 pool (pass as an argument, never close over it —
        closed-over arrays become baked-in constants under jit)."""
        return self._pool

    def _build_assemble(self):
        mesh = self.mesh
        has_lab3 = "LAB3" in self._pool
        has_lab = "LAB" in self._pool
        assemble = self.assemble_pure

        def out_shardings():
            sh = {
                "A": image_sharding(mesh, 4),
                "B": image_sharding(mesh, 4),
                "T_B": image_sharding(mesh, 3),
            }
            if has_lab3:
                sh["LAB3"] = image_sharding(mesh, 2)
            if has_lab:
                sh["LAB"] = image_sharding(mesh, 1)
            return sh

        return jax.jit(assemble, out_shardings=out_shardings())

    def batch(self, idx: np.ndarray) -> dict[str, jax.Array]:
        """Assemble one batch for integer indices ``idx`` on device."""
        return self._assemble(self._pool, jnp.asarray(idx, jnp.int32))

    def index_batches(
        self,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 42,
        drop_last: bool = True,
        epochs: int | None = None,
    ) -> Iterator[np.ndarray]:
        """Per-batch integer index arrays with ``pairs.batch_iterator`` order
        semantics — feed to ``Trainer.fit(..., pool=this)`` for the fused
        single-dispatch path."""
        rng = np.random.RandomState(seed)
        epoch = 0
        while epochs is None or epoch < epochs:
            order = np.arange(self.n)
            if shuffle:
                rng.shuffle(order)
            n_full = self.n // batch_size if drop_last else -(-self.n // batch_size)
            for i in range(n_full):
                yield order[i * batch_size : (i + 1) * batch_size]
            epoch += 1

    def batches(
        self,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 42,
        drop_last: bool = True,
        epochs: int | None = None,
    ) -> Iterator[dict[str, jax.Array]]:
        """Device-batch iterator with ``pairs.batch_iterator`` order
        semantics. ``Trainer.fit`` consumes these directly (already placed)."""
        index_stream = lambda: self.index_batches(
            batch_size, shuffle=shuffle, seed=seed, drop_last=drop_last,
            epochs=epochs)

        # assemble on a feeder thread: the per-batch index upload blocks its
        # caller (~40 ms over a tunneled chip), so overlapping it with the
        # running step needs a real thread, not just async dispatch
        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=2)
        done = object()
        err: list[BaseException] = []

        def feeder():
            try:
                for idx in index_stream():
                    q.put(self.batch(idx))
            except BaseException as e:
                err.append(e)
            finally:
                q.put(done)

        threading.Thread(target=feeder, daemon=True, name="pool-assemble").start()
        while True:
            item = q.get()
            if item is done:
                if err:
                    raise err[0]
                return
            yield item

    def steps_per_epoch(self, batch_size: int) -> int:
        return self.n // batch_size
