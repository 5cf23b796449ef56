"""The TFC-GAN recipe matrix.

One parameterized recipe replaces the ~20 near-identical FFT/favtgan trainer
scripts (SURVEY.md §2.1-2.2). ``LossConfig`` switches select:

- patch triplet over a 2×2 or 4×4 grid with randomized whole-quadrant
  negatives (``TFCGAN_multigpu_globalFFT.py:462-477``),
- temperature triplet with ColorJitter negatives × λ_t (``:479-489``),
- LPIPS perceptual term (``:492``),
- global or per-patch FFT amplitude+phase L1 (``:494-499``,
  ``patchFFT_16P.py:323-375``),
- regional hair/eyes FFT loss, L1 or KL flavor
  (``withregion_FFT.py:353-404``, ``withregion_FFT_KL.py:390-420``),
- the debiased label-conditional family: conditional G, aux-classifier D,
  regional ethnicity CNNs, CE losses (``debiased_V7.py:640-712``).

Everything is computed in-graph on NHWC batches; the per-sample host
round-trips of the reference (vectorize_temps / fft_components) are replaced
by the batched ops in ``tfcgan_tpu.ops``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfcgan_tpu import ops
from tfcgan_tpu.config import ExperimentConfig
from tfcgan_tpu.models import (
    AuxClassifierDiscriminator,
    ConditionalGeneratorUNet,
    GeneratorUNet,
    LPIPS,
    PatchDiscriminator,
)
from tfcgan_tpu.models.layers import spectral_power_iteration
from tfcgan_tpu.models.lpips import (
    load_lpips_params,
    resolve_lpips_weights,
    resolve_perceptual,
    resolve_resnet_weights,
)
from tfcgan_tpu.models.resnet import ResNet18
from tfcgan_tpu.ops.fftloss import fft_amp_phase
from tfcgan_tpu.ops.perceptual import multiscale_recon


def _dtype(cfg: ExperimentConfig):
    return jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32


def patch_triplet_loss(fake, real, key, grid: int) -> jax.Array:
    """Per-patch triplet with a random whole-quadrant negative per term.

    Matches the reference exactly: each patch term draws one uniform patch
    index and uses that *entire* real patch stack entry as the negative for
    all batch elements (``random_patches[randint]``, ``:470-477``); the sum is
    averaged over patches. Distances reduce along W (torch last-dim), axis=2
    in NHWC.
    """
    fp = ops.patchify(fake, grid)  # (P, N, h, w, C)
    rp = ops.patchify(real, grid)
    p = grid * grid
    neg_idx = jax.random.randint(key, (p,), 0, p)
    neg = rp[neg_idx]  # (P, N, h, w, C)
    per_patch = jax.vmap(
        lambda a, pos, n: ops.triplet_margin_loss(a, pos, n, axis=2)
    )(fp, rp, neg)
    return jnp.mean(per_patch)


def temperature_triplet_loss(fake, real, t_real, key, lam: float, mode: str) -> jax.Array:
    """λ_t · triplet(T(fake), T_B, T(jitter(real))) (``:479-489``).

    t_real: (N, H, W) Celsius map from the data pipeline (real-image LUT).
    """
    t_fake = ops.temperature_lut(fake, mode=mode)
    jittered = ops.color_jitter(key, real)
    t_neg = ops.temperature_lut(jittered, mode=mode)
    # torch operates on (N,1,H,W): distance along W == axis -1 here.
    return ops.triplet_margin_loss(t_fake, t_real, t_neg, axis=-1) * lam


def temperature_l1_loss(fake, t_real, lam: float, mode: str) -> jax.Array:
    """favtgan _L1 variant: λ_t · L1(T(fake), T_B) (``favtgan_..._L1.py:429``)."""
    t_fake = ops.temperature_lut(fake, mode=mode)
    return jnp.mean(jnp.abs(t_fake - t_real)) * lam


def temperature_map_loss(fake, real, t_real, mode: str) -> jax.Array:
    """favtgan _TempMap variant (``favtgan_..._TempMap.py:436-439``): L1
    between red-channel × temperature-map matmul products, /1000. Implemented
    per sample (the reference's batched torch.matmul broadcast quirk is not
    reproduced)."""
    t_fake = ops.temperature_lut(fake, mode=mode)
    red_r = real[..., 0].astype(jnp.float32)
    red_f = fake[..., 0].astype(jnp.float32)
    map_r = jnp.einsum("nhw,nwk->nhk", red_r, t_real.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST)
    map_f = jnp.einsum("nhw,nwk->nhk", red_f, t_fake,
                       precision=jax.lax.Precision.HIGHEST)
    return jnp.mean(jnp.abs(map_r - map_f)) / 1000.0


def fft_loss(fake, real, cfg) -> jax.Array:
    """Global or per-patch FFT amp+phase L1 (0.5·(L1_amp + L1_pha))."""
    if cfg.fft_grid <= 1:
        loss, _, _ = ops.fftloss.fft_l1_loss(fake, real, mode=cfg.fft_quantize)
        return loss
    # Fold the patch axis into the batch: one big batched rfft2 instead of
    # grid² small ones (equal-size patches -> mean over (P·N) equals the
    # reference's mean of 16 per-patch means, ``calculate_ffts``).
    fp = ops.patchify(fake, cfg.fft_grid)
    rp = ops.patchify(real, cfg.fft_grid)
    merge = lambda p: p.reshape(-1, *p.shape[2:])
    loss, _, _ = ops.fftloss.fft_l1_loss(merge(fp), merge(rp), mode=cfg.fft_quantize)
    return loss


def regional_fft_loss(fake, real, cfg) -> jax.Array:
    """Hair rows [0:100) and eyes rows [100:200) bands, full width
    (``withregion_FFT.py:374-379``). 'l1' sums band L1 losses; 'kl' applies
    KLDivLoss(log_target=True) between log-softmax over the batch dim
    (``withregion_FFT_KL.py:398-420``)."""
    def bands(x):
        # rows scale with H; at the reference's 256 these are exactly
        # [0:100) (hair) and [100:200) (eyes)
        h = x.shape[1]
        r1 = round(100 * h / 256)
        return x[:, 0:r1, :, :], x[:, r1 : 2 * r1, :, :]

    fh, fe = bands(fake)
    rh, re_ = bands(real)

    def comps(x):
        return fft_amp_phase(x, mode=cfg.fft_quantize)

    (ah_f, ph_f), (ae_f, pe_f) = comps(fh), comps(fe)
    (ah_r, ph_r), (ae_r, pe_r) = comps(rh), comps(re_)

    if cfg.region_fft == "l1":
        amp = jnp.mean(jnp.abs(ah_f - ah_r)) + jnp.mean(jnp.abs(ae_f - ae_r))
        pha = jnp.mean(jnp.abs(ph_f - ph_r)) + jnp.mean(jnp.abs(pe_f - pe_r))
        return 0.5 * (amp + pha)

    def kl(inp, tgt):
        # torch KLDivLoss(log_target=True, reduction='mean'):
        # mean(exp(t) * (t - i)) with i, t already log-probabilities.
        li = jax.nn.log_softmax(inp, axis=0)
        lt = jax.nn.log_softmax(tgt, axis=0)
        return jnp.mean(jnp.exp(lt) * (lt - li))

    amp = kl(ah_f, ah_r) + kl(ae_f, ae_r)
    pha = kl(ph_f, ph_r) + kl(pe_f, pe_r)
    return 0.5 * (amp + pha)


def debias_axes(lc) -> dict:
    """Variant semantics of the debiased chain, derived from
    ``LossConfig.debias_version`` (the per-script facts):

    =====  ========  =========  ======  ========  ========  =========
    ver    heads     G labels   ethn×   regional  CNN opt   FFT form
    =====  ========  =========  ======  ========  ========  =========
    1      g/e/a     random     1       —         —         patch L1
    2      g/e/a     real       1       —         —         patch L1
    3      g/e/a     real       10      —         —         patch L1
    4      g/e/a     real       —       yes       G (fc)    triplet
    5      g/e/a     real       —       yes       G (fc)    triplet
    6      ethn      real       —       yes       G (fc)    patch L1
    7      ethn      real       —       yes       frozen    patch L1
    =====  ========  =========  ======  ========  ========  =========

    V1 additionally feeds D's fake-label CE the *same* random labels G was
    conditioned on (``debiased.py:508-606``); V2+ draw fresh ones at the D
    step. V1 sums the three D label CEs; V2+ average by 1/3
    (``_V2.py:611-617``). The V4+ regional ResNet18s keep a frozen backbone
    (``_V4.py:254``, ``requires_grad=False``); V7 chains their heads into D's
    optimizer where they receive zero gradients (loss_D never touches them,
    ``_V7.py:560-564,684-708``) — i.e. they are effectively fully frozen,
    which is how we implement them.
    """
    v = lc.debias_version
    if not 1 <= v <= 7:
        raise ValueError(f"debias_version must be 1..7, got {v}")
    return {
        "multi_head": v <= 5,
        "g_labels_random": v == 1,
        "ethn_scale": 10.0 if v == 3 else 1.0,
        "regional": v >= 4,
        "cnn_train_g": 4 <= v <= 6,
        "fft_triplet": v in (4, 5),
        "d_label_avg": 1.0 if v == 1 else 1.0 / 3.0,
    }


def fft_triplet_loss(fake, real, key, cfg) -> jax.Array:
    """V4/V5 FFT form (``_V4.py:387-432``): per-patch amplitude and phase
    triplets with one random whole real patch as the shared negative of a
    patch's amp and phase terms; ¼-averaged; returns ½(amp + pha)."""
    g = cfg.fft_grid
    p = g * g
    fp, rp = ops.patchify(fake, g), ops.patchify(real, g)
    neg = rp[jax.random.randint(key, (p,), 0, p)]
    merge = lambda x: x.reshape(-1, *x.shape[2:])
    af, pf = fft_amp_phase(merge(fp), mode=cfg.fft_quantize)
    ar, pr = fft_amp_phase(merge(rp), mode=cfg.fft_quantize)
    an, pn = fft_amp_phase(merge(neg), mode=cfg.fft_quantize)
    # merged (P·N) mean == reference's ¼·Σ of per-patch means (equal sizes)
    amp = ops.triplet_margin_loss(af, ar, an, axis=-1)
    pha = ops.triplet_margin_loss(pf, pr, pn, axis=-1)
    return 0.5 * (amp + pha)


def cross_entropy(logits_or_probs: jax.Array, labels: jax.Array, from_probs: bool) -> jax.Array:
    """torch CrossEntropyLoss with integer labels. The aux-D head outputs
    softmax probs which the reference feeds to CrossEntropyLoss anyway (a
    double-softmax quirk, ``debiased_V7.py:236-247,657``) — reproduced via
    ``from_probs=True`` (re-log-softmax the probs)."""
    x = jnp.log(jax.nn.softmax(logits_or_probs)) if from_probs else jax.nn.log_softmax(logits_or_probs)
    onehot = jax.nn.one_hot(labels, x.shape[-1])
    return -jnp.mean(jnp.sum(onehot * x, axis=-1))


class TFCGANRecipe:
    name = "tfcgan"
    # extra["spectral_cadence"]="per_forward" reproduces the reference's exact
    # spectral-norm semantics: torch's parametrizations.spectral_norm advances
    # u/v at every D forward (4×/step — ``globalFFT.py:190,454-526``); the
    # fast default advances once per step in the trainer.
    supports_per_forward_spectral = True

    def __init__(self, cfg: ExperimentConfig):
        self.cfg = cfg
        self.per_forward_spectral = (
            cfg.extra.get("spectral_cadence", "per_step") == "per_forward"
        )
        dt = _dtype(cfg)
        lc = cfg.loss
        if lc.conditional and lc.use_mask:
            # no reference trainer combines them, and the conditional G input
            # path carries no mask channel — reject rather than half-apply
            raise ValueError("conditional and use_mask are mutually exclusive")
        if lc.conditional:
            self.axes = debias_axes(lc)
            mh = self.axes["multi_head"]
            self.G = ConditionalGeneratorUNet(out_channels=cfg.data.channels, dtype=dt)
            self.D = AuxClassifierDiscriminator(
                num_classes=lc.num_classes,
                num_gender=lc.num_gender if mh else 0,
                num_age=lc.num_age if mh else 0,
                dtype=dt,
            )
            if self.axes["regional"]:
                # with converted torchvision weights the backbone runs in
                # BN-folded form (see models/resnet.py); GroupNorm otherwise
                nrm = "folded" if resolve_resnet_weights(lc) else "gn"
                self.cnn_hair = ResNet18(num_classes=lc.num_classes, dtype=dt, norm=nrm)
                self.cnn_eyes = ResNet18(num_classes=lc.num_classes, dtype=dt, norm=nrm)
            else:
                self.cnn_hair = self.cnn_eyes = None
        else:
            self.G = GeneratorUNet(out_channels=cfg.data.channels, dtype=dt)
            self.D = PatchDiscriminator(dtype=dt)
        # perceptual backend: LPIPS (pretrained via lc.lpips_weights when
        # supplied) or the fixed msrecon pyramid (ops/perceptual.py)
        self.perceptual = resolve_perceptual(lc) if lc.use_lpips else "off"
        self.lpips = LPIPS(dtype=dt) if self.perceptual == "lpips" else None

    # ------------------------------------------------------------------ init
    def init(self, key, batch):
        kg, kd, kl, kh, ke = jax.random.split(key, 5)
        a, b = batch["A"], batch["B"]
        lc = self.cfg.loss
        if lc.conditional:
            # G is conditioned on the raw (gender, ethn, age) float triple
            # (``_V7.py:166,643``: fc(labels: (N,3)) -> one input plane)
            g_vars = self.G.init(kg, a, batch["LAB3"].astype(jnp.float32))
            d_vars = self.D.init(kd, a, b)
        else:
            g_vars = self.G.init(kg, self._g_input(batch))
            d_vars = self.D.init(kd, a, b)
        frozen = {}
        if self.lpips is not None:
            lw = resolve_lpips_weights(lc)
            if lw:
                frozen["lpips"] = load_lpips_params(lw)
            else:
                frozen["lpips"] = self.lpips.init(kl, a, b)
        g_params = {"G": g_vars["params"]}
        d_params = {"D": d_vars["params"]}
        if lc.conditional and self.axes["regional"]:
            # V4+ regional CNNs: frozen ResNet18 backbone (``_V4.py:254``),
            # trainable fc head — with G's optimizer in V4–V6, fully frozen in
            # V7 (see debias_axes). ``resnet_weights`` injects converted
            # torchvision weights into the backbone when provided.
            hair = a[:, 0 : round(100 * a.shape[1] / 256), :, :]
            full_h = dict(self.cnn_hair.init(kh, hair)["params"])
            full_e = dict(self.cnn_eyes.init(ke, hair)["params"])
            rw = resolve_resnet_weights(lc)
            if rw:
                from tfcgan_tpu.models.resnet import load_resnet18_backbone

                bb = load_resnet18_backbone(rw)
                full_h = {**full_h, **bb}
                full_e = {**full_e, **dict(bb)}
            fc_h, fc_e = full_h.pop("fc"), full_e.pop("fc")
            if self.axes["cnn_train_g"]:
                g_params["cnn_hair"] = {"fc": fc_h}
                g_params["cnn_eyes"] = {"fc": fc_e}
                frozen["cnn_hair_bb"] = full_h
                frozen["cnn_eyes_bb"] = full_e
            else:
                frozen["cnn_hair"] = {**full_h, "fc": fc_h}
                frozen["cnn_eyes"] = {**full_e, "fc": fc_e}
        return {
            "g_params": g_params,
            "d_params": d_params,
            "spectral": {"D": d_vars["spectral"]},
            "frozen": frozen,
        }

    # -------------------------------------------------------------- helpers
    def _g_input(self, batch):
        """G input: real_A, optionally ⊕ its saliency mask as a 4th channel
        (``patchFFT_experiment.py:548,563``: G takes (real_A, mask_A))."""
        a = batch["A"]
        if self.cfg.loss.use_mask:
            return jnp.concatenate([a, ops.saliency_mask(a).astype(a.dtype)], -1)
        return a

    def _gen(self, g_params, batch, rng, deterministic=False, labels=None):
        if self.cfg.loss.conditional:
            lab = batch["LAB3"] if labels is None else labels
            return self.G.apply(
                {"params": g_params["G"]}, batch["A"], lab.astype(jnp.float32),
                deterministic=deterministic, rngs={"dropout": rng},
            )
        return self.G.apply(
            {"params": g_params["G"]}, self._g_input(batch),
            deterministic=deterministic, rngs={"dropout": rng},
        )

    def _cnn_params(self, which: str, g_params, frozen):
        """Regional-CNN param tree: frozen backbone ∪ the fc head's home
        (g_params for V4–V6, frozen for V7 — see debias_axes)."""
        if self.axes["cnn_train_g"]:
            return {**frozen[f"{which}_bb"], **g_params[which]}
        return frozen[which]

    def _disc(self, d_params, spectral, img, cond):
        out = self.D.apply(
            {"params": d_params["D"], "spectral": spectral["D"]}, img, cond
        )
        return out  # logits, or (logits, probs) when conditional

    def _single_pass_d(self) -> bool:
        """Concatenate the (fake, real) pair into ONE D forward per phase.

        A spectral-norm PatchGAN has no cross-batch coupling (fixed-σ convs,
        InstanceNorm per sample, blur-pool per sample), so batching the two
        forwards of ``globalFFT.py:458-460,519-526`` is numerically identical
        while halving D weight reads and launches (D was 182 ms/step in the
        round-2 profile). Inapplicable to the per-forward spectral cadence,
        where u/v must advance BETWEEN the two forwards.

        Measured IN SITU at the flagship b128 @256² it REGRESSES: 396 →
        462 ms/step (323.3 → 276.8 img/s, back-to-back A/B on chip,
        BASELINE.md round 4) — the 2N-batch D tensors at the HBM cliff cost
        more in fusion/peak than the halved weight traffic saves, the same
        lesson as the Pallas blur-pool and elementwise max-pool. OPT-IN via
        TFCGAN_SINGLE_PASS_D=1 (trace-time); parity of the two forms is
        pinned by tests/test_train.py (they differ only by conv-backward
        accumulation order)."""
        import os

        if self.per_forward_spectral:
            return False
        return os.environ.get("TFCGAN_SINGLE_PASS_D", "0") not in ("0", "false")

    def _disc_pair(self, d_params, spectral, first, second, cond):
        """(D(first|cond), D(second|cond)) via ONE concatenated forward —
        only valid under the per-step spectral cadence (u/v fixed across the
        phase), which ``_single_pass_d`` guarantees."""
        both = self._disc(
            d_params, spectral,
            jnp.concatenate([first, second], axis=0),
            jnp.concatenate([cond, cond], axis=0),
        )
        n = first.shape[0]
        return both[:n], both[n:]

    def _advance_spectral(self, d_params, spectral):
        """Per-forward cadence: one u/v power iteration in torch's
        parametrizations order BEFORE a D forward (no-op on the per-step
        default, where the trainer advances once)."""
        if self.per_forward_spectral:
            return spectral_power_iteration(d_params, spectral, order="uv")
        return spectral

    # --------------------------------------------------------------- losses
    def g_loss(self, g_params, d_params, spectral, frozen, batch, rng):
        cfg = self.cfg.loss
        k_drop, k_patch, k_temp, k_lab, k_fft = jax.random.split(rng, 5)
        a, b = batch["A"], batch["B"]

        metrics = {}
        aux_extra = {}
        # extra["deterministic_g"] disables G dropout inside the train step —
        # used by the torch lockstep trajectory-parity tests, where
        # cross-framework dropout masks cannot be aligned
        det = bool(self.cfg.extra.get("deterministic_g", False))
        if cfg.conditional:
            ax = self.axes
            lab3 = batch["LAB3"]
            if ax["g_labels_random"]:
                # V1 conditions G on freshly drawn labels and scores its label
                # CE against them (``debiased.py:500-522``)
                kg_, ke_, ka_ = jax.random.split(k_lab, 3)
                n = lab3.shape[0]
                g3 = jnp.stack(
                    [
                        jax.random.randint(kg_, (n,), 0, cfg.num_gender),
                        jax.random.randint(ke_, (n,), 0, cfg.num_classes),
                        jax.random.randint(ka_, (n,), 0, cfg.num_age),
                    ],
                    axis=1,
                )
                aux_extra["gen_lab3"] = g3
            else:
                g3 = lab3
            fake_b = self._gen(g_params, batch, k_drop, deterministic=det, labels=g3)
            spectral = self._advance_spectral(d_params, spectral)
            pred_fake, probs_f = self._disc(d_params, spectral, fake_b, a)
            spectral = self._advance_spectral(d_params, spectral)
            pred_real, _ = self._disc(d_params, spectral, b, a)
        else:
            fake_b = self._gen(g_params, batch, k_drop, deterministic=det)
            if self._single_pass_d():
                pred_fake, pred_real = self._disc_pair(
                    d_params, spectral, fake_b, b, a
                )
            else:
                # reference forward order in the G phase: D(fake) then D(real)
                # (``globalFFT.py:458-459``) — u/v advance before each
                spectral = self._advance_spectral(d_params, spectral)
                pred_fake = self._disc(d_params, spectral, fake_b, a)
                spectral = self._advance_spectral(d_params, spectral)
                pred_real = self._disc(d_params, spectral, b, a)
        adv = ops.relativistic_g_loss(pred_fake, pred_real, cfg.label_smooth)
        total = cfg.adv_weight * adv
        metrics["g_adv"] = adv

        if cfg.patch_grid > 0:
            trip = patch_triplet_loss(fake_b, b, k_patch, cfg.patch_grid)
            total += cfg.triplet_weight * trip
            metrics["g_triplet"] = trip
        if cfg.use_temp:
            if cfg.temp_mode == "l1":
                temp = temperature_l1_loss(
                    fake_b, batch["T_B"], cfg.temp_lambda, cfg.temp_quantize
                )
            elif cfg.temp_mode == "tempmap":
                temp = temperature_map_loss(fake_b, b, batch["T_B"], cfg.temp_quantize)
            else:
                temp = temperature_triplet_loss(
                    fake_b, b, batch["T_B"], k_temp, cfg.temp_lambda, cfg.temp_quantize
                )
            total += cfg.temp_weight * temp
            metrics["g_temp"] = temp
        if self.lpips is not None:
            perc = jnp.mean(self.lpips.apply(frozen["lpips"], fake_b, b))
            total += cfg.lpips_weight * perc
            metrics["g_lpips"] = perc
        elif self.perceptual == "msrecon":
            perc = multiscale_recon(fake_b, b)
            total += cfg.lpips_weight * perc
            metrics["g_lpips"] = perc
        if cfg.fft_mode != "off":
            if cfg.conditional and self.axes["fft_triplet"]:
                fft = fft_triplet_loss(fake_b, b, k_fft, cfg)
            else:
                fft = fft_loss(fake_b, b, cfg)
            total += cfg.fft_weight * fft
            metrics["g_fft"] = fft
        if cfg.region_fft != "off":
            reg = regional_fft_loss(fake_b, b, cfg)
            total += cfg.region_fft_weight * reg
            metrics["g_region_fft"] = reg
        if cfg.use_mask:
            # L1 between saliency masks of fake and real
            # (``patchFFT_experiment.py:584``)
            mask = jnp.mean(jnp.abs(ops.saliency_mask(fake_b) - ops.saliency_mask(b)))
            total += cfg.mask_weight * mask
            metrics["g_mask"] = mask
        if cfg.conditional:
            # G's label loss; targets are the labels G was conditioned on
            # (real for V2+, the random draw for V1)
            gender, ethn, age = g3[:, 0], g3[:, 1], g3[:, 2]
            if ax["multi_head"]:
                pg_f, pe_f, pa_f = probs_f
            else:
                pe_f = probs_f
            if ax["regional"]:
                r1 = round(100 * fake_b.shape[1] / 256)
                hair = fake_b[:, 0:r1, :, :]
                eyes = fake_b[:, r1 : 2 * r1, :, :]
                hp = self.cnn_hair.apply(
                    {"params": self._cnn_params("cnn_hair", g_params, frozen)}, hair
                )
                ep = self.cnn_eyes.apply(
                    {"params": self._cnn_params("cnn_eyes", g_params, frozen)}, eyes
                )
                reg_ce = cross_entropy(hp, ethn, False) + cross_entropy(ep, ethn, False)
                tot_ethn = 0.5 * (reg_ce + cross_entropy(pe_f, ethn, True))
                if ax["multi_head"]:  # V4/V5 (``_V4.py:627-629``)
                    ce = tot_ethn + cross_entropy(pg_f, gender, True) + cross_entropy(pa_f, age, True)
                else:  # V6/V7 (``_V7.py:655-656``)
                    ce = tot_ethn
            else:  # V1–V3 (``_V3.py:531``: 10× on the ethnicity term)
                ce = (
                    cross_entropy(pg_f, gender, True)
                    + ax["ethn_scale"] * cross_entropy(pe_f, ethn, True)
                    + cross_entropy(pa_f, age, True)
                )
            total += cfg.ce_weight * ce
            metrics["g_ce"] = ce

        metrics["loss_G"] = total
        aux = {"fake_b": jax.lax.stop_gradient(fake_b), **aux_extra}
        if self.per_forward_spectral:
            aux["spectral"] = spectral  # hand the advanced u/v to the D phase
        return total, (aux, metrics)

    def d_loss(self, d_params, spectral, aux, batch, rng):
        cfg = self.cfg.loss
        a, b = batch["A"], batch["B"]
        fake_b = aux["fake_b"]
        # reference forward order in the D phase: D(real) then D(fake.detach())
        # (``globalFFT.py:519-521``)
        if cfg.conditional:
            spectral = self._advance_spectral(d_params, spectral)
            pred_real, probs_r = self._disc(d_params, spectral, b, a)
            spectral = self._advance_spectral(d_params, spectral)
            pred_fake, probs_f = self._disc(d_params, spectral, fake_b, a)
        elif self._single_pass_d():
            pred_real, pred_fake = self._disc_pair(d_params, spectral, b, fake_b, a)
        else:
            spectral = self._advance_spectral(d_params, spectral)
            pred_real = self._disc(d_params, spectral, b, a)
            spectral = self._advance_spectral(d_params, spectral)
            pred_fake = self._disc(d_params, spectral, fake_b, a)
        loss = ops.relativistic_d_loss(
            pred_real, pred_fake, cfg.label_smooth, cfg.d_loss_weight
        )
        metrics = {"loss_D": loss}
        if self.per_forward_spectral:
            metrics["_spectral"] = spectral  # popped by the trainer, not logged
        if cfg.conditional:
            # loss_D = ½((adv_real + real_label) + (adv_fake + fake_label)):
            # real targets are the annotations; fake targets are random draws
            # (V1 reuses the draw G conditioned on, ``debiased.py:606``)
            ax = self.axes
            lab3 = batch["LAB3"]
            if ax["g_labels_random"]:
                gen3 = aux["gen_lab3"]
            else:
                kg_, ke_, ka_ = jax.random.split(rng, 3)
                n = lab3.shape[0]
                gen3 = jnp.stack(
                    [
                        jax.random.randint(kg_, (n,), 0, cfg.num_gender),
                        jax.random.randint(ke_, (n,), 0, cfg.num_classes),
                        jax.random.randint(ka_, (n,), 0, cfg.num_age),
                    ],
                    axis=1,
                )

            def label_ce(probs, tgt3):
                if ax["multi_head"]:
                    pg, pe, pa = probs
                    return ax["d_label_avg"] * (
                        cross_entropy(pg, tgt3[:, 0], True)
                        + cross_entropy(pe, tgt3[:, 1], True)
                        + cross_entropy(pa, tgt3[:, 2], True)
                    )
                return cross_entropy(probs, tgt3[:, 1], True)

            ce = 0.5 * (label_ce(probs_r, lab3) + label_ce(probs_f, gen3))
            loss = loss + ce
            metrics["d_ce"] = ce
            metrics["loss_D"] = loss
        return loss, metrics
