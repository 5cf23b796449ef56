"""Flash self-attention for the diffusion UNet's spatial attention.

Why a kernel: the reference's ``AttnDownBlock2D``/``AttnUpBlock2D`` attention
(``/root/reference/TFC-Diff/prototype_condA.py:59-90`` via diffusers'
``AttentionBlock``) runs over HW tokens with head_dim=8 — at 64² resolution
that is a (N·heads, 4096, 4096) score matrix. The XLA path (even query-chunked
under ``jax.checkpoint``, ``models/diffusion.AttentionBlock``) must
materialize each fp32 score slab in HBM between the two matmuls, fwd and
again in the rematerialized bwd: ~17 GiB written+read per attention layer per
direction at b16 — the dominant cost of the tfc_diff step (BASELINE.md
round 3, 505.6 ms/step).

TPU-native redesign: scores never leave VMEM.

- Layout is ``(BH, D, S)`` — head_dim (8) on *sublanes*, sequence on *lanes*.
  With D=8 a q/k/v tile is exactly one fp32 (8, 128k) vreg group; the usual
  (S, D) layout would use 8 of 128 lanes. All four matmuls in fwd+bwd then
  contract over either D (sublanes) or S (lanes ≥ 1024) on the MXU.
- Because D·S is tiny (8·4096 fp32 = 128 KB), each q-block kernel invocation
  sees the FULL key/value extent: one pass, ordinary (not online) softmax,
  still exact. No m/l scratch carry, every grid dimension parallel.
- Softmax statistics in fp32 (the reference upcasts scores to fp32 before
  softmax — diffusers' ``upcast_softmax=True``); probabilities are cast back
  to the value dtype before P@V exactly as the XLA path does.
- Backward: the standard flash decomposition from the saved logsumexp —
  ``ds = p * (dp - di)``, ``di = Σ_d o·do`` — as two kernels, dq tiled over
  queries and dkv tiled over keys, each recomputing its p-tile in VMEM.

Used by ``models/diffusion.AttentionBlock`` on TPU (kill switch
``TFCGAN_FLASH_ATTN=0``); the CPU backend keeps the XLA chunked path so host
test meshes stay bit-identical to the torch replica. The kernel itself is
validated in interpret mode by tests/test_pallas_flashattn.py and under real
Mosaic lowering by the tfc_diff AOT check.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_BQ = 256  # query rows per fwd/dq invocation
_BK = 128  # key rows per dkv invocation (4 (BK,S) fp32 slabs live in VMEM)


def flash_attention_supported(seq: int, head_dim: int) -> bool:
    """Shapes the kernel handles; callers fall back to the XLA path otherwise.

    Upper bound: the fwd kernel keeps (BQ, S) fp32 score/softmax slabs in
    VMEM — S=16384 (a 256^2 input at the UNet's top attention block)
    measured 17.09M of the 16M scoped-vmem budget on v5e (round 5). 4096 is
    the validated shape (tools/aot_flashattn.py); 8192 AOT-compiles with
    margin. Beyond that the chunked-XLA path takes over.
    """
    return seq % _BQ == 0 and _BQ <= seq <= 8192 and head_dim <= 128


def _dot_dd(a, b):  # (D, M)ᵀ(D, N) -> (M, N): contract sublane dim
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_ss(a, b):  # (D, S)·(M, S)ᵀ -> (D, M): contract lane dim
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _mm_small_d(at, b):
    """(M, D)·(D, N) -> (M, N) as D broadcast-FMAs on the VPU.

    diffusers' head_dim=8 makes the MXU form a 16x-underutilized 8-deep
    systolic contraction (~7.6 TF/s effective, BASELINE round 5); this
    replaces it with D column-x-row FMAs. ``at`` carries the contraction
    dim on LANES (M, D), ``b`` on SUBLANES (D, N) — the natural layouts of
    the transposed/original operands, so no in-kernel transposes. Measured
    SLOWER in practice (see _use_vpu_qk) — the slab re-walks dominate."""
    d = at.shape[1]
    acc = None
    for i in range(d):
        t = at[:, i : i + 1].astype(jnp.float32) * b[i : i + 1, :].astype(jnp.float32)
        acc = t if acc is None else acc + t
    return acc


def _fwd_kernel_vpu(qt_ref, k_ref, v_ref, o_ref, lse_ref, *, scale):
    qt = qt_ref[0]  # (BQ, D)
    k = k_ref[0]  # (D, S)
    s = _mm_small_d(qt, k) * scale  # (BQ, S) fp32, lives only in VMEM
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    pn = (p / l).astype(v_ref.dtype)
    o_ref[0] = _dot_ss(v_ref[0], pn).astype(o_ref.dtype)  # (D, BQ)
    lse_ref[0] = (m + jnp.log(l)).reshape(1, -1)


def _dq_kernel_vpu(qt_ref, k_ref, v_ref, dot_ref, lse_ref, di_ref, dq_ref, *, scale):
    qt, k, v, dot = qt_ref[0], k_ref[0], v_ref[0], dot_ref[0]
    s = _mm_small_d(qt, k) * scale          # (BQ, S)
    p = jnp.exp(s - lse_ref[0].reshape(-1, 1))
    dp = _mm_small_d(dot, v)                # (BQ, S)
    ds = p * (dp - di_ref[0].reshape(-1, 1)) * scale
    dq_ref[0] = _dot_ss(k, ds).astype(dq_ref.dtype)  # (D, BQ)


def _dkv_kernel_vpu(q_ref, kt_ref, vt_ref, do_ref, lse_ref, di_ref, dk_ref,
                    dv_ref, *, scale):
    q, kt, vt, do = q_ref[0], kt_ref[0], vt_ref[0], do_ref[0]
    st = _mm_small_d(kt, q) * scale         # (BK, S) — scores transposed
    pt = jnp.exp(st - lse_ref[0])           # lse broadcasts over key rows
    dv_ref[0] = _dot_ss(do, pt.astype(do.dtype)).astype(dv_ref.dtype)
    dpt = _mm_small_d(vt, do)               # (BK, S)
    dst = pt * (dpt - di_ref[0]) * scale
    dk_ref[0] = _dot_ss(q, dst).astype(dk_ref.dtype)  # (D, BK)


def _use_vpu_qk(d: int) -> bool:
    """OPT-IN (TFCGAN_FLASH_VPU=1) — measured WORSE on v5e (round 5):
    at (BH=256, S=4096, D=8) fwd 28.6 vs 18.0 ms, fwd+bwd 89.9 vs 50.8.
    The D broadcast-FMA formulation walks the (BQ, S) fp32 slab D times
    (8x the VMEM traffic of the single MXU write), which costs more than
    the 16x-padded 8-deep systolic contraction it avoids. Kept because the
    trade flips for larger slabs-per-byte ratios (future chips / wider D
    where the MXU pad factor shrinks the other way)."""
    env = os.environ.get("TFCGAN_FLASH_VPU", "0").lower()
    if env in ("auto", ""):
        return d <= 16
    return env not in ("0", "false")


def _use_fused_bwd() -> bool:
    """Default ON (TFCGAN_FLASH_FUSED_BWD=0 restores the two-kernel form).

    Measured on v5e at up1's (BH=256, S=4096, D=8): fwd+bwd 51.0 -> 38.2 ms
    (tools/bench_flashattn.py) — the fused kernel computes the score slab
    once instead of twice and loads K/V from HBM once per query block
    instead of twice."""
    return os.environ.get("TFCGAN_FLASH_FUSED_BWD", "1") not in ("0", "false")


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale):
    q = q_ref[0]  # (D, BQ)
    k = k_ref[0]  # (D, S)
    s = _dot_dd(q, k) * scale  # (BQ, S) fp32, lives only in VMEM
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    pn = (p / l).astype(v_ref.dtype)  # cast as the XLA path casts post-softmax
    o_ref[0] = _dot_ss(v_ref[0], pn).astype(o_ref.dtype)  # (D, BQ)
    lse_ref[0] = (m + jnp.log(l)).reshape(1, -1)


def _bwd_fused_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                      dq_ref, dk_ref, dv_ref, *, scale):
    """One grid step = dq for query block i PLUS this block's dk/dv partials.

    The unfused form (two kernels below) recomputes the (rows, S) score slab
    twice — once tiled over queries for dq, once tiled over keys for dk/dv —
    and walks the K/V slabs from HBM in both. Here the p/ds tiles computed
    for dq are reused for dk/dv via the transposed contractions
    ``dk += q_i·ds`` / ``dv += do_i·p`` (contract the query-block dim), with
    the (D, S) accumulators held in fp32 VMEM across the sequential i-loop
    (same output block index for every i → Mosaic keeps them resident and
    flushes once per b). Accumulating in fp32 matches the unfused kernels'
    single-fp32-dot-then-cast precision.
    """
    i = pl.program_id(1)
    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    s = _dot_dd(q, k) * scale               # (BQ, S)
    p = jnp.exp(s - lse_ref[0].reshape(-1, 1))
    dp = _dot_dd(do, v)                     # (BQ, S)
    ds = p * (dp - di_ref[0].reshape(-1, 1)) * scale
    dq_ref[0] = _dot_ss(k, ds).astype(dq_ref.dtype)  # (D, BQ)
    # (D, BQ)·(BQ, S) -> (D, S): contract the query-block dim
    mm = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dkp = mm(q, ds)
    dvp = mm(do, p.astype(do.dtype))

    @pl.when(i == 0)
    def _init():
        dk_ref[0] = dkp
        dv_ref[0] = dvp

    @pl.when(i > 0)
    def _acc():
        dk_ref[0] += dkp
        dv_ref[0] += dvp


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref, *, scale):
    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    s = _dot_dd(q, k) * scale               # (BQ, S)
    p = jnp.exp(s - lse_ref[0].reshape(-1, 1))
    dp = _dot_dd(do, v)                     # (BQ, S)
    ds = p * (dp - di_ref[0].reshape(-1, 1)) * scale
    dq_ref[0] = _dot_ss(k, ds).astype(dq_ref.dtype)  # (D, BQ)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dk_ref, dv_ref, *, scale):
    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    st = _dot_dd(k, q) * scale              # (BK, S) — scores transposed
    pt = jnp.exp(st - lse_ref[0])           # lse broadcasts over key rows
    dv_ref[0] = _dot_ss(do, pt.astype(do.dtype)).astype(dv_ref.dtype)
    dpt = _dot_dd(v, do)                    # (BK, S)
    dst = pt * (dpt - di_ref[0]) * scale
    dk_ref[0] = _dot_ss(q, dst).astype(dk_ref.dtype)  # (D, BK)


def _specs(d, s, bq):
    qs = pl.BlockSpec((1, d, bq), lambda b, i: (b, 0, i))
    ks = pl.BlockSpec((1, d, s), lambda b, i: (b, 0, 0))
    rs = pl.BlockSpec((1, 1, bq), lambda b, i: (b, 0, i))  # per-query rows
    return qs, ks, rs


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash(q, k, v, scale, interpret):
    o, _ = _flash_fwd_impl(q, k, v, scale, interpret)
    return o


def _flash_fwd_impl(q, k, v, scale, interpret):
    bh, d, s = q.shape
    qs, ks, rs = _specs(d, s, _BQ)
    out_shape = [
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct((bh, 1, s), jnp.float32),
    ]
    if _use_vpu_qk(d):
        # Q transposed host-side so its contraction dim rides on lanes;
        # one cheap XLA relayout per call, no in-kernel transposes.
        qts = pl.BlockSpec((1, _BQ, d), lambda b, i: (b, i, 0))
        o, lse = pl.pallas_call(
            functools.partial(_fwd_kernel_vpu, scale=scale),
            out_shape=out_shape,
            grid=(bh, s // _BQ),
            in_specs=[qts, ks, ks],
            out_specs=[qs, rs],
            interpret=interpret,
        )(jnp.swapaxes(q, 1, 2), k, v)
        return o, lse
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        out_shape=out_shape,
        grid=(bh, s // _BQ),
        in_specs=[qs, ks, ks],
        out_specs=[qs, rs],
        interpret=interpret,
    )(q, k, v)
    return o, lse


def _flash_vjp_fwd(q, k, v, scale, interpret):
    o, lse = _flash_fwd_impl(q, k, v, scale, interpret)
    return o, (q, k, v, o, lse)


def _flash_vjp_bwd(scale, interpret, res, do):
    q, k, v, o, lse = res
    bh, d, s = q.shape
    # di[i] = Σ_d o·do — cheap elementwise reduce, shared by both kernels
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32),
                 axis=1, keepdims=True)  # (BH, 1, S)
    qs, ks, rs = _specs(d, s, _BQ)
    full_r = pl.BlockSpec((1, 1, s), lambda b, i: (b, 0, 0))
    kt = pl.BlockSpec((1, d, _BK), lambda b, j: (b, 0, j))
    if _use_vpu_qk(d):
        qts = pl.BlockSpec((1, _BQ, d), lambda b, i: (b, i, 0))
        ktt = pl.BlockSpec((1, _BK, d), lambda b, j: (b, j, 0))
        dq = pl.pallas_call(
            functools.partial(_dq_kernel_vpu, scale=scale),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            grid=(bh, s // _BQ),
            in_specs=[qts, ks, ks, qts, rs, rs],
            out_specs=qs,
            interpret=interpret,
        )(jnp.swapaxes(q, 1, 2), k, v, jnp.swapaxes(do, 1, 2), lse, di)
        dk, dv = pl.pallas_call(
            functools.partial(_dkv_kernel_vpu, scale=scale),
            out_shape=[
                jax.ShapeDtypeStruct(k.shape, k.dtype),
                jax.ShapeDtypeStruct(v.shape, v.dtype),
            ],
            grid=(bh, s // _BK),
            in_specs=[ks, ktt, ktt, ks, full_r, full_r],
            out_specs=[kt, kt],
            interpret=interpret,
        )(q, jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2), do, lse, di)
        return dq, dk, dv
    if _use_fused_bwd():
        # The fused kernel's (bq, S) fp32 slabs exceed the 16 MB scoped-VMEM
        # budget at S=8192 with bq=256 (16.63M, AOT-measured); halve the
        # query block there — slab cost scales with bq·S.
        bq = _BQ if s <= 4096 else _BQ // 2
        qs_f, _, rs_f = _specs(d, s, bq)
        dq, dk, dv = pl.pallas_call(
            functools.partial(_bwd_fused_kernel, scale=scale),
            out_shape=[
                jax.ShapeDtypeStruct(q.shape, q.dtype),
                jax.ShapeDtypeStruct(k.shape, jnp.float32),
                jax.ShapeDtypeStruct(v.shape, jnp.float32),
            ],
            grid=(bh, s // bq),
            in_specs=[qs_f, ks, ks, qs_f, rs_f, rs_f],
            out_specs=[qs_f, ks, ks],
            interpret=interpret,
        )(q, k, v, do, lse, di)
        return dq, dk.astype(k.dtype), dv.astype(v.dtype)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(bh, s // _BQ),
        in_specs=[qs, ks, ks, qs, rs, rs],
        out_specs=qs,
        interpret=interpret,
    )(q, k, v, do, lse, di)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale),
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        grid=(bh, s // _BK),
        in_specs=[ks, kt, kt, ks, full_r, full_r],
        out_specs=[kt, kt],
        interpret=interpret,
    )(q, k, v, do, lse, di)
    return dq, dk, dv


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    interpret: bool | None = None,
) -> jax.Array:
    """softmax(qᵀk·scale)ᵀ-weighted values, scores never materialized to HBM.

    q/k/v: ``(BH, head_dim, S)`` — sequence on lanes (see module docstring).
    Returns ``(BH, head_dim, S)`` in the input dtype. Softmax in fp32, probs
    cast to the value dtype before P@V (diffusers' upcast_softmax semantics).
    """
    if interpret is None:
        from tfcgan_tpu.ops.pallas_kernels.dispatch import default_interpret

        interpret = default_interpret()
    bh, d, s = q.shape
    if not flash_attention_supported(s, d):
        raise ValueError(f"unsupported attention shape (S={s}, D={d})")
    return _flash(q, k, v, scale, interpret)
