"""Trainers: single-B (LHBDC, T1) and two-stage recursive (ICIP2024, T2).

Parity targets in /root/reference:
  - LHBDC/train.py:164-304: joint alpha*MSE + rate loss, separate Adam for
    the factorized-prior quantiles (lr 1e-3 vs 1e-4), grad clip 1.0.
  - ICIP2024/src/train/training.py:47-378: random rate level and down_ratio
    per step; stage 1 (< stage2_start) codes the single middle frame from
    intra-coded endpoints; stage 2 codes the middle recursively and then the
    quarter frames from (endpoint, middle-reconstruction), averaging losses;
    lr 1e-4 -> 1e-5 at 500k; checkpoint when validation BD-rate improves.
  - Optimizer split (T3, LHBDC/test/utils.py:324-362): quantile parameters
    get their own optimizer; the aux loss reaches only quantiles (its
    gradient stops at model params) and the main loss gives quantiles zero
    gradient, so one combined loss with a multi-transform optimizer is
    exactly the reference's two-optimizer scheme.

TPU notes: a train step is a single jitted function (loss + grads + both
optimizer updates). Data parallelism comes from sharding the batch axis over
the mesh (tpuvc.parallel); recursive stage 2 wraps the codec forwards in
jax.checkpoint to fit the 3-forward chain in HBM (SURVEY.md 7.3.4).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


def make_optimizer(
    lr: float = 1e-4,
    aux_lr: float = 1e-3,
    grad_clip: float = 1.0,
    lr_drop_step: int | None = 500_000,
    drop_factor: float = 0.1,
    skip_nonfinite: int = 0,
    plateau_patience: int | None = None,
    plateau_factor: float = 0.5,
    plateau_min_scale: float = 0.01,
):
    """Multi-transform optimizer: 'aux' for quantile params, 'main' for the
    rest, with the reference's step-wise lr drop.

    plateau_patience enables the LHBDC-family ReduceLROnPlateau schedule
    (reference /root/reference/LHBDC/test/utils.py:359-361: mode='min',
    factor=0.5, patience=5, min_lr) on the main optimizer: the train step
    passes the loss through ``tx.update(..., value=loss)`` and the LR is
    scaled by ``plateau_factor`` after ``plateau_patience`` non-improving
    evaluations, floored at ``plateau_min_scale`` of the base LR.

    skip_nonfinite > 0 wraps the whole transform in
    ``optax.apply_if_finite``: a step whose gradients contain NaN/inf is
    dropped (params unchanged) instead of poisoning the run — failure
    detection the reference trainer lacks; after that many consecutive
    bad steps, updates pass through again so the divergence is visible."""

    def schedule(base):
        if lr_drop_step is None:
            return base
        return optax.piecewise_constant_schedule(
            base, {lr_drop_step: drop_factor}
        )

    main_parts = [
        optax.clip_by_global_norm(grad_clip),
        optax.adam(schedule(lr)),
    ]
    if plateau_patience is not None:
        main_parts.append(
            optax.contrib.reduce_on_plateau(
                factor=plateau_factor,
                patience=plateau_patience,
                min_scale=plateau_min_scale,
            )
        )
    main = optax.chain(*main_parts)
    aux = optax.adam(schedule(aux_lr))

    def label_fn(params):
        def label(path, _):
            return "aux" if any(
                getattr(k, "key", None) == "quantiles" for k in path
            ) else "main"

        return jax.tree_util.tree_map_with_path(label, params)

    tx = optax.multi_transform({"main": main, "aux": aux}, label_fn)
    if skip_nonfinite > 0:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=skip_nonfinite)
    # Steps always pass value=loss; transforms that don't consume it
    # (everything but reduce_on_plateau) ignore it.
    return optax.with_extra_args_support(tx)


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


def init_state(params, tx) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params), step=0)


def make_lhbdc_step(model, tx, alpha: float, distortion: str = "mse"):
    """Single-B training step for LHBDC-style codecs.

    batch: (B, 3, H, W, C) triplets [before, current, after].
    distortion: 'mse' (reference T1 objective) or 'ms_ssim'
    (alpha * (1 - MS-SSIM) + rate; needs crops >= 176 px).
    """
    from tpuvc.train.loss import distortion_fn

    dist, _ = distortion_fn(distortion)

    def loss_fn(params, batch, rng):
        xb, xc, xa = batch[:, 0], batch[:, 1], batch[:, 2]
        out = model.apply({"params": params}, xb, xc, xa, "noise", rng=rng)
        d = dist(out["x_hat"], xc)
        rate = jnp.mean(out["rate"])
        aux = model.apply({"params": params}, method=type(model).aux_loss)
        loss = alpha * d + rate + aux
        return loss, {"mse": d, "rate": rate, "aux": aux}

    @jax.jit
    def step(state_params, state_opt, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state_params, batch, rng
        )
        updates, new_opt = tx.update(
            grads, state_opt, state_params, value=loss
        )
        new_params = optax.apply_updates(state_params, updates)
        metrics["loss"] = loss
        return new_params, new_opt, metrics

    return step


def make_recursive_step(
    code_fn: Callable,
    aux_fn: Callable,
    tx,
    beta: float,
    intra_fn: Callable | None = None,
    remat: bool = True,
    distortion: str = "mse",
):
    """Two-stage recursive training step (ICIP2024 style).

    Args:
      code_fn(params, ref1, ref2, xcur, rng, order, order1, order2,
              level, down_ratio) -> (x_hat, rate)
      aux_fn(params) -> aux loss
      intra_fn(x) -> intra reconstruction (frozen; identity if None).
      batch: (B, 5, H, W, C) windows [f1..f5].

    Returns step(params, opt_state, batch, rng, stage2: bool, level,
    down_ratio) — stage/level/down_ratio are static (python) per call;
    each (stage2, down_ratio) pair compiles once.
    """
    if intra_fn is None:
        intra_fn = lambda x: x
    coded = (
        jax.checkpoint(code_fn, static_argnums=(5, 6, 7, 9))
        if remat
        else code_fn
    )
    from tpuvc.train.loss import distortion_fn

    dist, dist_scale = distortion_fn(distortion)

    def loss_fn(params, batch, rng, stage2, level, down_ratio):
        f = [batch[:, i] for i in range(5)]
        dec1 = jax.lax.stop_gradient(intra_fn(f[0]))
        dec5 = jax.lax.stop_gradient(intra_fn(f[4]))
        r = jax.random.split(rng, 3)

        def rd(x_hat, x, rate):
            return beta * dist_scale * dist(x_hat, x) + jnp.mean(rate)

        x3, rate3 = coded(
            params, dec1, dec5, f[2], r[0], 2, 0, 4, level, down_ratio
        )
        loss = rd(x3, f[2], rate3)
        if stage2:
            x2, rate2 = coded(
                params, dec1, x3, f[1], r[1], 1, 0, 2, level, down_ratio
            )
            x4, rate4 = coded(
                params, x3, dec5, f[3], r[2], 3, 2, 4, level, down_ratio
            )
            loss = (loss + rd(x2, f[1], rate2) + rd(x4, f[3], rate4)) / 3.0
        aux = aux_fn(params)
        return loss + aux, {"aux": aux}

    @functools.partial(jax.jit, static_argnums=(4, 5, 6))
    def step(params, opt_state, batch, rng, stage2, level, down_ratio):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng, stage2, level, down_ratio
        )
        updates, new_opt = tx.update(
            grads, opt_state, params, value=loss
        )
        new_params = optax.apply_updates(params, updates)
        metrics["loss"] = loss
        return new_params, new_opt, metrics

    return step


def make_dmc_step(
    model,
    tx,
    beta: float,
    n_pframes: int = 2,
    remat: bool = True,
    distortion: str = "mse",
    warp_weight: float = 0.0,
):
    """Cascaded P-frame training step for the DMC codec (low-delay).

    The reference's OJSP2025 codec is inference-only in-repo (a patch for
    DCVC-FM, whose trainer is absent); this completes the family with the
    DCVC-style cascaded recipe: ground-truth frame 0 seeds the DPB, each
    following frame is coded against the propagated decoded frame +
    feature, and per-frame RD losses are averaged so gradients flow
    through the propagation chain (error-recovery training).

    Args:
      batch: (B, n_pframes+1, H, W, C) consecutive frames.
      warp_weight: optional motion-bootstrapping term
        warp_weight * MSE(warp(ref, mv_hat), x) (DCVC stage-1 analog).

    Returns step(params, opt_state, batch, rng, q) — q (rate level) is
    traced (gain interpolation is a single formula), so one compiled graph
    serves every level, integer or fractional.
    """
    from tpuvc.train.loss import distortion_fn

    dist, dist_scale = distortion_fn(distortion)

    def code_one(params, x, dpb, rng, q):
        out = model.apply(
            {"params": params}, x, dpb, ratio=1.0, mode="ste", rng=rng, q=q,
        )
        return out["x_hat"], out["dpb"], out["warped"], out["rate"]

    coded = jax.checkpoint(code_one) if remat else code_one

    def loss_fn(params, batch, rng, q):
        B, n, H, W, C = batch.shape
        # Frame 0 seeds the DPB with the DCVC "fresh after intra" state:
        # zero feature / latent priors (PFrameDMC treats None as zeros;
        # explicit zeros here keep one traced structure across steps).
        from tpuvc.models.dmc import MV_FEAT

        dpb = {
            "ref_frame": batch[:, 0],
            "ref_feature": jnp.zeros((B, H, W, model.feat), batch.dtype),
            "ref_mv_feature": jnp.zeros((B, H, W, MV_FEAT), batch.dtype),
            "ref_y": jnp.zeros(
                (B, H // 8, W // 8, model.N), batch.dtype
            ),
            "ref_mv_y": jnp.zeros(
                (B, H // 8, W // 8, model.N), batch.dtype
            ),
            "ref_down_ratio": 1.0,
        }
        keys = jax.random.split(rng, n - 1)
        loss = 0.0
        tot_rate = 0.0
        tot_dist = 0.0
        for i in range(1, n):
            x = batch[:, i]
            x_hat, dpb, warped, rate = coded(
                params, x, dpb, keys[i - 1], q
            )
            d = dist(x_hat, x)
            loss += beta * dist_scale * d + jnp.mean(rate)
            if warp_weight:
                loss += warp_weight * jnp.mean((warped - x) ** 2)
            tot_rate += jnp.mean(rate)
            tot_dist += d
        loss = loss / (n - 1)
        aux = model.apply({"params": params}, method=type(model).aux_loss)
        return loss + aux, {
            "aux": aux,
            "rate": tot_rate / (n - 1),
            "mse": tot_dist / (n - 1),
        }

    @jax.jit
    def step(params, opt_state, batch, rng, q):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng, q
        )
        updates, new_opt = tx.update(
            grads, opt_state, params, value=loss
        )
        new_params = optax.apply_updates(params, updates)
        metrics["loss"] = loss
        return new_params, new_opt, metrics

    return step


class BDCheckpointer:
    """Keep the checkpoint whose validation BD-rate vs a fixed anchor is best.

    Parity: ICIP2024/src/train/training.py:318-344 — checkpoint on BD-rate
    improvement, not loss.
    """

    def __init__(self, anchor_rates, anchor_psnrs, save_fn: Callable):
        self.anchor = (list(anchor_rates), list(anchor_psnrs))
        self.best_bd = float("inf")
        self.save_fn = save_fn

    def update(self, rates, psnrs, state) -> bool:
        from tpuvc.eval.bd_rate import bd_rate

        bd = bd_rate(self.anchor[0], self.anchor[1], rates, psnrs)
        if bd < self.best_bd:
            self.best_bd = bd
            self.save_fn(state)
            return True
        return False
