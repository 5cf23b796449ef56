"""Can AffineSTN + the Pallas warp learn a known shift when given a clean
supervised signal? Isolates the registration machinery from the GAN losses
(whose perceptual anchor is meaningless without pretrained LPIPS weights)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, numpy as np, jax.numpy as jnp
import optax
from tfcgan_tpu.models.stn import AffineSTN

SIZE, B, DX, DY = 128, 16, 8, -6
r = np.random.RandomState(0)
a = np.tanh(r.randn(B, SIZE // 32, SIZE // 32, 3).repeat(32, 1).repeat(32, 2)).astype(np.float32)
b_aligned = -np.roll(a, 1, axis=-1)
b_obs = np.roll(np.roll(b_aligned, DY, axis=1), DX, axis=2)

stn = AffineSTN()
params = stn.init(jax.random.PRNGKey(0), jnp.asarray(a), jnp.asarray(a), jnp.asarray(b_obs))
tx = optax.adam(1e-4)
opt = tx.init(params)


@jax.jit
def step(params, opt):
    def loss(p):
        warped = stn.apply(p, jnp.asarray(a), jnp.asarray(a), jnp.asarray(b_obs))
        return jnp.mean(jnp.abs(warped - jnp.asarray(b_aligned)))

    l, g = jax.value_and_grad(loss)(params)
    up, opt = tx.update(g, opt)
    return optax.apply_updates(params, up), opt, l


for i in range(801):
    params, opt, l = step(params, opt)
    if i % 200 == 0:
        th = stn.apply(params, jnp.asarray(a), jnp.asarray(a), method="theta")
        print(f"step {i}: L1={float(l):.4f} theta_t="
              f"({float(th[:,0,2].mean()):+.4f},{float(th[:,1,2].mean()):+.4f}) "
              f"target ~({2*DX/SIZE:+.3f},{2*DY/SIZE:+.3f})", flush=True)
