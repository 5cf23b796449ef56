"""On-chip timing for the flash-attention Pallas kernel.

Times fwd and fwd+bwd at the tfc_diff hot shapes (BASELINE round 5: up1 is
(BH=256, S=4096, D=8) at the canonical b32@128² step) across query-block
sizes, so block-size claims in flashattn.py stay re-measurable. The tunnel's
block_until_ready lies (CLAUDE.md), so timing uses chained dependencies +
np.asarray on a scalar.

Usage: python tools/bench_flashattn.py [BH S D] [--bq 256,512]
Reference context: diffusers AttentionBlock via
/root/reference/TFC-Diff/prototype_condA.py:59-90.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TFCGAN_PALLAS_INTERPRET", "0")

import jax
import jax.numpy as jnp
import numpy as np

from tfcgan_tpu.ops.pallas_kernels import flashattn


def timed(fn, *args, iters=10):
    """fn must return a SCALAR — chaining big device arrays host-side adds
    ~10 ms/iter of tunnel dispatch that swamps the kernel (first version of
    this tool 'measured' fwd slower than fwd+bwd that way)."""
    s = float(np.asarray(fn(*args)))  # compile
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(iters):
        acc = acc + fn(*args)
    s = float(np.asarray(acc))  # forces the chain
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3, s


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    bqs = [256]
    for a in sys.argv[1:]:
        if a.startswith("--bq"):
            bqs = [int(x) for x in a.split("=", 1)[1].split(",")]
    bh, s, d = (int(x) for x in argv) if len(argv) == 3 else (256, 4096, 8)
    key = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(kk, (bh, d, s), jnp.bfloat16)
        for kk in jax.random.split(key, 3)
    )
    scale = d ** -0.5

    def fwd(q, k, v):
        return flashattn.flash_attention(q, k, v, scale, interpret=False)

    def loss(q, k, v):
        o = fwd(q, k, v)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    jfwd = jax.jit(loss)

    @jax.jit
    def jgrad(q, k, v):
        dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        return (jnp.sum(dq.astype(jnp.float32)) + jnp.sum(dk.astype(jnp.float32))
                + jnp.sum(dv.astype(jnp.float32)))

    # The first timed program in a fresh process absorbs ~80 ms/iter of
    # tunnel warm-up (measured: identical configs read 94-96 ms first slot,
    # 17-18 ms any later slot) — burn it on a throwaway round.
    timed(jfwd, q, k, v, iters=3)
    for bq in bqs:
        flashattn._BQ = bq
        jfwd.clear_cache()
        jgrad.clear_cache()
        try:
            t_f, _ = timed(jfwd, q, k, v)
            t_g, _ = timed(jgrad, q, k, v)
            print(f"BH={bh} S={s} D={d} BQ={bq}: fwd {t_f:.1f} ms  "
                  f"fwd+bwd {t_g:.1f} ms", flush=True)
        except Exception as e:  # VMEM OOM at large BQ is expected
            print(f"BH={bh} S={s} D={d} BQ={bq}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
