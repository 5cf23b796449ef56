"""One-off: measure the 100-step lockstep drift observables (fills the
documented numbers in tests/test_parity_trajectory.py::TestTrajectoryDrift)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import conftest  # noqa: F401  (cache config lives in the fixture; fine without)
from test_parity_trajectory import run_lockstep

state, tg, td, jh, th = run_lockstep(100)
def jnorm(tree):
    return float(np.sqrt(sum(float((np.asarray(x, np.float64)**2).sum())
                             for x in jax.tree_util.tree_leaves(tree))))
def tnorm(mod):
    return float(np.sqrt(sum(float((p.detach().numpy().astype(np.float64)**2).sum())
                             for p in mod.parameters())))
g_j = jnorm(jax.device_get(state.g_params)["G"]); g_t = tnorm(tg)
d_j = jnorm(jax.device_get(state.d_params)["D"]); d_t = tnorm(td)
print(f"G norm rel diff {abs(g_j/g_t-1):.2e}  D {abs(d_j/d_t-1):.2e}")
d_params = jax.device_get(state.d_params)["D"]; spectral = jax.device_get(state.spectral)["D"]
for i, blk in enumerate(td.blocks):
    w = np.asarray(d_params[f"block{i}_conv"]["kernel"], np.float64)
    s = spectral[f"block{i}_conv"]
    w2d = w.reshape(-1, w.shape[-1]).T
    sj = float(np.asarray(s["u"], np.float64) @ (w2d @ np.asarray(s["v"], np.float64)))
    wt = blk.weight.detach().numpy().astype(np.float64)
    st = float(blk.u.numpy().astype(np.float64) @ (wt.reshape(wt.shape[0], -1) @ blk.v.numpy().astype(np.float64)))
    print(f"block{i} sigma rel diff {abs(sj/st-1):.2e}")
mj, mt = jh[-30:].mean(axis=0), th[-30:].mean(axis=0)
print(f"last-30 mean loss_G {mj[0]:.4f} vs {mt[0]:.4f} (rel {abs(mj[0]/mt[0]-1):.2e})")
print(f"last-30 mean loss_D {mj[1]:.4f} vs {mt[1]:.4f} (rel {abs(mj[1]/mt[1]-1):.2e})")
for s in (4, 10, 20, 40, 70, 99):
    print(f"step {s}: rel diff G {abs(jh[s,0]-th[s,0])/max(1e-9,abs(th[s,0])):.2e}")
