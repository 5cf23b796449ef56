"""Full training state as one pytree.

The reference checkpoints only model ``state_dict``s — optimizer moments, AMP
scaler, and RNG state are lost on resume (SURVEY.md §5.3-5.4). Here the state
carries everything needed for bit-identical resume: both optimizer states,
spectral-norm power-iteration state, the PRNG key, and the step counter.
bf16 compute needs no GradScaler, so there is none.
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct

from tfcgan_tpu.config import ExperimentConfig


class GANTrainState(struct.PyTreeNode):
    step: jax.Array
    rng: jax.Array
    g_params: Any
    d_params: Any
    spectral: Any
    frozen: Any
    g_opt_state: Any
    d_opt_state: Any
    extra: Any = None  # recipe-owned state (e.g. CycleGAN replay buffers)


def _lr(cfg: ExperimentConfig):
    o = cfg.optim
    if o.schedule == "constant":
        return o.lr
    if o.schedule == "linear_decay":
        # CycleGAN LambdaLR: lr · (1 − max(0, epoch − decay_epoch) / (n − decay))
        spe = cfg.train.steps_per_epoch or 1
        n, dec = cfg.train.n_epochs, o.decay_start_epoch

        def sched(step):
            epoch = step / spe
            frac = jax.numpy.maximum(0.0, epoch - dec) / max(n - dec, 1)
            return o.lr * jax.numpy.maximum(0.0, 1.0 - frac)

        return sched
    if o.schedule == "step":
        # NeMAR get_scheduler 'step': gamma=0.1 every lr_decay_iters epochs
        spe = cfg.train.steps_per_epoch or 1

        def sched(step):
            epoch = step / spe
            return o.lr * 0.1 ** jax.numpy.floor(epoch / max(o.decay_start_epoch, 1))

        return sched
    if o.schedule == "cosine":
        # NeMAR get_scheduler 'cosine': anneal to 0 over n_epochs
        spe = cfg.train.steps_per_epoch or 1
        n = cfg.train.n_epochs

        def sched(step):
            epoch = step / spe
            return o.lr * 0.5 * (1.0 + jax.numpy.cos(jax.numpy.pi * epoch / n))

        return sched
    if o.schedule == "plateau":
        # metric-driven: the step-level lr is constant; ReduceLROnPlateau
        # rewrites it at epoch boundaries via set_learning_rate().
        return o.lr
    raise ValueError(o.schedule)


def make_optimizers(cfg: ExperimentConfig) -> tuple[optax.GradientTransformation, optax.GradientTransformation]:
    o = cfg.optim
    lr = _lr(cfg)
    if o.schedule == "plateau":
        # inject_hyperparams exposes learning_rate in the opt state so the
        # host-side plateau controller can rewrite it between epochs.
        make = optax.inject_hyperparams(optax.adam)
        return make(learning_rate=lr, b1=o.b1, b2=o.b2), make(
            learning_rate=lr, b1=o.b1, b2=o.b2
        )
    g_tx = optax.adam(lr, b1=o.b1, b2=o.b2)
    d_tx = optax.adam(lr, b1=o.b1, b2=o.b2)
    return g_tx, d_tx


class ReduceLROnPlateau:
    """NeMAR's 'plateau' mode (``nemar/models/networks.py:32-45``): torch
    ``ReduceLROnPlateau(mode='min', factor=0.2, threshold=0.01, patience=5)``.

    The reference wires the scheduler but never feeds it a metric (SURVEY §2.7
    "unused upstream"); here ``step(metric)`` is called once per epoch with a
    validation loss and returns the lr to install via ``set_learning_rate``.
    Semantics match torch's rel-threshold min mode: an epoch improves when
    ``metric < best·(1−threshold)``; after ``patience`` consecutive
    non-improving epochs lr ← lr·factor (best is kept, not reset).
    """

    def __init__(self, lr: float, factor: float = 0.2, patience: int = 5,
                 threshold: float = 0.01, min_lr: float = 0.0):
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = float("inf")
        self.num_bad_epochs = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.num_bad_epochs = 0
        return self.lr


def set_learning_rate(state: GANTrainState, lr: float) -> GANTrainState:
    """Install a new lr into both inject_hyperparams opt states (plateau)."""

    def upd(s):
        return s._replace(
            hyperparams={**s.hyperparams, "learning_rate": jax.numpy.asarray(lr, jax.numpy.float32)}
        )

    return state.replace(
        g_opt_state=upd(state.g_opt_state), d_opt_state=upd(state.d_opt_state)
    )


def create_state(cfg: ExperimentConfig, recipe, key: jax.Array, batch) -> GANTrainState:
    init_key, run_key = jax.random.split(key)
    pieces = recipe.init(init_key, batch)
    g_tx, d_tx = make_optimizers(cfg)
    return GANTrainState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        rng=run_key,
        g_params=pieces["g_params"],
        d_params=pieces["d_params"],
        spectral=pieces["spectral"],
        frozen=pieces["frozen"],
        g_opt_state=g_tx.init(pieces["g_params"]),
        d_opt_state=d_tx.init(pieces["d_params"]),
        extra=pieces.get("extra"),
    )
