"""Threaded, double-buffered input pipeline.

Replaces the reference's ``DataLoader(..., num_workers=opt.n_cpu,
pin_memory=True)`` (``/root/reference/TFC-GAN-FFT/TFCGAN_multigpu_globalFFT.py:
393-409``) with two composable stages:

- ``PrefetchLoader``: a thread pool assembling whole batches concurrently
  (PIL decode and the native C++ loader both release the GIL, so threads
  scale on this I/O+decode workload without multiprocessing's pickling tax);
  batches are yielded in deterministic (seeded-shuffle) order regardless of
  completion order.
- ``device_prefetch``: a lookahead thread that ``shard_batch``-places the
  next batch(es) onto the mesh while the current step runs, hiding the
  host->device transfer (which costs ~2 s/step for a 25 MB batch over a
  tunneled TPU if done synchronously in the step loop).

``Trainer.fit`` detects already-placed batches and skips its own
``shard_batch``, so both stages compose with the existing loop unchanged.
"""

from __future__ import annotations

import collections
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Iterator

import numpy as np


class PrefetchLoader:
    """Deterministic threaded batcher over an indexable dataset.

    Semantics match ``pairs.batch_iterator`` (seeded shuffle per epoch,
    drop_last) with ``num_workers`` batches assembled concurrently.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        num_workers: int = 4,
        shuffle: bool = True,
        seed: int = 42,
        drop_last: bool = True,
        epochs: int | None = None,
        raw: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epochs = epochs
        # raw=True assembles uint8 batches (dataset.raw_item) for the 4×-
        # cheaper uint8 device transfer — pair with device_prefetch(via_uint8)
        self.raw = raw

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _load_batch(self, idxs: np.ndarray) -> dict[str, np.ndarray]:
        get = self.dataset.raw_item if self.raw else self.dataset.__getitem__
        items = [get(int(j)) for j in idxs]
        return {k: np.stack([it[k] for it in items]) for k in items[0]}

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        rng = np.random.RandomState(self.seed)
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            epoch = 0
            while self.epochs is None or epoch < self.epochs:
                order = np.arange(len(self.dataset))
                if self.shuffle:
                    rng.shuffle(order)
                n_full = len(self)
                # sliding window: keep num_workers+2 batches in flight so
                # memory stays bounded while workers run ahead of the consumer
                window = self.num_workers + 2
                futures = collections.deque()

                def submit(i):
                    futures.append(
                        pool.submit(
                            self._load_batch,
                            order[i * self.batch_size : (i + 1) * self.batch_size],
                        )
                    )

                for i in range(min(window, n_full)):
                    submit(i)
                nxt = min(window, n_full)
                while futures:
                    yield futures.popleft().result()
                    if nxt < n_full:
                        submit(nxt)
                        nxt += 1
                epoch += 1


def _uint8_stager(mesh):
    """jitted on-device finisher for raw uint8 batches: normalize + LUT,
    matching the host float path (``pairs._normalize``) to 1 ulp."""
    import jax
    import jax.numpy as jnp

    from tfcgan_tpu.ops.temperature import TEMP_MAX_C, TEMP_MIN_C
    from tfcgan_tpu.parallel.mesh import image_sharding

    def finish(a_u8, b_u8):
        norm = lambda u: (u.astype(jnp.float32) / 255.0 - 0.5) / 0.5
        t_b = TEMP_MIN_C + b_u8[..., 0].astype(jnp.float32) * (
            (TEMP_MAX_C - TEMP_MIN_C) / 255.0
        )
        return norm(a_u8), norm(b_u8), t_b

    return jax.jit(
        finish,
        out_shardings=(
            image_sharding(mesh, 4),
            image_sharding(mesh, 4),
            image_sharding(mesh, 3),
        ),
    )


def device_prefetch(
    batches: Iterable[dict], mesh, depth: int = 2, via_uint8: bool = False
) -> Iterator:
    """Wrap a host-batch iterator: a lookahead thread ``shard_batch``-places
    up to ``depth`` batches onto ``mesh`` ahead of the consumer, overlapping
    host->device transfer with the running step.

    ``via_uint8=True`` consumes *raw* batches ({"A_u8", "B_u8", labels...} —
    ``PrefetchLoader(raw=True)``), ships the 4×-smaller uint8 tensors, and
    normalizes + derives T_B on device. Emitted batches match the float path
    to 1 fp32 ulp (XLA reassociates the affine normalize)."""
    import jax

    from tfcgan_tpu.parallel.mesh import image_sharding, shard_batch

    q: queue.Queue = queue.Queue(maxsize=depth)
    done = object()
    err: list[BaseException] = []
    stager = _uint8_stager(mesh) if via_uint8 else None

    def place(b: dict):
        if not via_uint8:
            return shard_batch(b, mesh)
        a_u8 = jax.device_put(b["A_u8"], image_sharding(mesh, 4))
        b_u8 = jax.device_put(b["B_u8"], image_sharding(mesh, 4))
        a, bb, t_b = stager(a_u8, b_u8)
        out = {"A": a, "B": bb, "T_B": t_b}
        rest = {k: v for k, v in b.items() if k not in ("A_u8", "B_u8")}
        return {**out, **shard_batch(rest, mesh)} if rest else out

    def feeder():
        try:
            for b in batches:
                q.put(place(b))
        except BaseException as e:  # surface loader errors to the consumer
            err.append(e)
        finally:
            q.put(done)

    t = threading.Thread(target=feeder, daemon=True, name="device-prefetch")
    t.start()
    while True:
        item = q.get()
        if item is done:
            if err:
                raise err[0]
            return
        yield item


def is_device_batch(batch: dict) -> bool:
    """True when every leaf is already a committed jax.Array (placed by
    ``device_prefetch`` / ``shard_batch``) — ``Trainer.fit`` then skips its
    own placement."""
    import jax

    return all(isinstance(v, jax.Array) for v in batch.values())
