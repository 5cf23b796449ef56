"""User-level smoke: Pallas dense grid_sample vs torch.grid_sample (CPU).

Random deformable-style grids at ragged sizes; checks fwd values and
grad-wrt-image/grid against torch's bilinear/zeros/align_corners=False.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from tfcgan_tpu.ops.pallas_kernels import grid_sample_dense

rng = np.random.default_rng(0)
for (h, w, hg, wg) in [(64, 64, 64, 64), (37, 53, 29, 41)]:
    img = rng.standard_normal((2, h, w, 3)).astype(np.float32)
    grid = (rng.standard_normal((2, hg, wg, 2)) * 0.7).astype(np.float32)

    def loss(im, gr):
        o = grid_sample_dense(im, gr, mode="bilinear", padding_mode="zeros",
                              align_corners=False)
        return jnp.sum(o ** 2), o

    (val, out), (gi, gg) = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
        jnp.asarray(img), jnp.asarray(grid))

    timg = torch.tensor(img.transpose(0, 3, 1, 2), requires_grad=True)
    tgrid = torch.tensor(grid, requires_grad=True)
    tout = F.grid_sample(timg, tgrid, mode="bilinear", padding_mode="zeros",
                         align_corners=False)
    tloss = (tout ** 2).sum()
    tloss.backward()

    e_out = np.abs(np.asarray(out) - tout.detach().numpy().transpose(0, 2, 3, 1)).max()
    e_gi = np.abs(np.asarray(gi) - timg.grad.numpy().transpose(0, 2, 3, 1)).max()
    e_gg = np.abs(np.asarray(gg) - tgrid.grad.numpy()).max()
    print(f"{h}x{w}->{hg}x{wg}: |out| {e_out:.2e}  |dimg| {e_gi:.2e}  |dgrid| {e_gg:.2e}")
    assert e_out < 1e-4 and e_gi < 1e-4 and e_gg < 2e-3, "parity FAIL"
print("PARITY_OK")
