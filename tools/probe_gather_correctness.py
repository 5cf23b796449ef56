import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend())
rng = np.random.RandomState(0)

# form 1: take_along_axis axis=1 on (N, H*W, C) — used by ops.warp.grid_sample
src = jnp.asarray(rng.randn(2, 4096, 3).astype(np.float32))
idx = jnp.asarray(rng.randint(0, 4096, (2, 1000, 1)), jnp.int32)
got = np.asarray(jnp.take_along_axis(src, idx, axis=1))
want = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=1)
print("taa (N,HW,C) axis=1:", np.abs(got-want).max())

# form 2: take_along_axis last axis 2D
src2 = jnp.asarray(rng.randn(256, 256).astype(np.float32))
idx2 = jnp.asarray(rng.randint(0, 256, (256, 256)), jnp.int32)
got = np.asarray(jnp.take_along_axis(src2, idx2, axis=1))
want = np.take_along_axis(np.asarray(src2), np.asarray(idx2), axis=1)
print("taa 2D last axis:", np.abs(got-want).max())

# form 3: x[idx] fancy row indexing
got = np.asarray(jnp.asarray(src2)[idx2[:, 0]])
want = np.asarray(src2)[np.asarray(idx2)[:, 0]]
print("row fancy:", np.abs(got-want).max())

# form 4: jnp.take flat
flat = src2.reshape(-1)
fidx = jnp.asarray(rng.randint(0, 65536, (500,)), jnp.int32)
got = np.asarray(jnp.take(flat, fidx))
want = np.asarray(flat)[np.asarray(fidx)]
print("flat take:", np.abs(got-want).max())
