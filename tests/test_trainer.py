import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvc.data.vimeo import SyntheticSeptuplets, make_batch_iterator
from tpuvc.train.trainer import (
    BDCheckpointer,
    init_state,
    make_lhbdc_step,
    make_optimizer,
    make_recursive_step,
)

pytestmark = pytest.mark.slow


class TestOptimizer:
    def test_quantile_params_get_aux_lr(self):
        tx = make_optimizer(lr=1e-4, aux_lr=1e-3, lr_drop_step=None)
        params = {
            "conv": {"kernel": jnp.ones((3, 3))},
            "eb": {"quantiles": jnp.ones((4, 1, 3))},
        }
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        # Adam step magnitude ~ lr for constant grads.
        up_main = float(jnp.abs(updates["conv"]["kernel"]).mean())
        up_aux = float(jnp.abs(updates["eb"]["quantiles"]).mean())
        assert up_aux > 5 * up_main

    def test_plateau_schedule_scales_lr(self):
        """ReduceLROnPlateau analog (reference LHBDC utils.py:359-361):
        a flat loss shrinks main updates by factor^k; aux is untouched."""
        params = {
            "conv": {"kernel": jnp.ones((3, 3))},
            "eb": {"quantiles": jnp.ones((4, 1, 3))},
        }
        tx = make_optimizer(
            lr=1e-4, aux_lr=1e-3, lr_drop_step=None, plateau_patience=2
        )
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        for _ in range(8):
            updates, state = tx.update(
                grads, state, params, value=jnp.float32(1.0)
            )
        up_main = float(jnp.abs(updates["conv"]["kernel"]).mean())
        up_aux = float(jnp.abs(updates["eb"]["quantiles"]).mean())
        # 8 flat steps with patience 2 -> at least two 0.5x drops.
        assert up_main < 0.3 * 1e-4
        assert up_aux > 5e-4

    def test_value_kwarg_ignored_without_plateau(self):
        tx = make_optimizer(lr=1e-4, lr_drop_step=None)
        params = {"conv": {"kernel": jnp.ones((3, 3))}}
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params, value=jnp.float32(3.0))
        assert float(jnp.abs(updates["conv"]["kernel"]).mean()) > 5e-5


class TestDataPipeline:
    def test_batch_shapes(self):
        ds = SyntheticSeptuplets(n=4, size=80)
        it = make_batch_iterator(ds, batch_size=2, crop=64, n_frames=3)
        batch = next(it)
        assert batch.shape == (2, 3, 64, 64, 3)
        assert batch.dtype == np.float32
        assert 0.0 <= batch.min() and batch.max() <= 1.0

    def test_five_frame_windows(self):
        ds = SyntheticSeptuplets(n=4, size=80)
        it = make_batch_iterator(ds, batch_size=1, crop=64, n_frames=5)
        assert next(it).shape == (1, 5, 64, 64, 3)


class TestLHBDCTrainer:
    def test_two_steps_update_params(self, rng):
        from tpuvc.models.lhbdc import LHBDC

        model = LHBDC(N=16)
        x = jnp.zeros((1, 192, 192, 3), jnp.float32)
        variables = model.init(jax.random.key(0), x, x, x, "dequantize")
        tx = make_optimizer(lr_drop_step=None)
        state = init_state(variables["params"], tx)
        step = make_lhbdc_step(model, tx, alpha=1626.0)

        ds = SyntheticSeptuplets(n=4, size=224)
        it = make_batch_iterator(ds, batch_size=1, crop=192, n_frames=3)
        p0 = jax.tree.leaves(state.params)[0].copy()
        params, opt, metrics = step(
            state.params, state.opt_state, jnp.asarray(next(it)),
            jax.random.key(1),
        )
        assert np.isfinite(float(metrics["loss"]))
        params, opt, metrics2 = step(
            params, opt, jnp.asarray(next(it)), jax.random.key(2)
        )
        assert float(jnp.abs(jax.tree.leaves(params)[0] - p0).sum()) > 0


class TestTrainingConverges:
    def test_training_converges(self, rng):
        """Loss/MSE/rate trajectory regression (VERDICT r2 task #7): a tiny
        LHBDC trained on synthetic frames must actually optimize the RD
        objective, not merely change parameters. Mirrors the manual
        measurement in PERF.md (300 steps: MSE 2.95 -> 1.9e-3, rate
        1.59 -> 0.146 bpp) at test scale."""
        from tpuvc.models.lhbdc import LHBDC

        model = LHBDC(N=16)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = model.init(jax.random.key(0), x, x, x, "dequantize")
        # lr=5e-4 + skip_nonfinite: the r3 configuration (lr=1e-3, no
        # skip) diverged to NaN around step ~130 on the CPU backend.
        tx = make_optimizer(lr=5e-4, lr_drop_step=None, skip_nonfinite=5)
        state = init_state(variables["params"], tx)
        step = make_lhbdc_step(model, tx, alpha=3141.0)

        ds = SyntheticSeptuplets(n=2, size=96)
        it = make_batch_iterator(ds, batch_size=2, crop=64, n_frames=3)
        batch = jnp.asarray(next(it))

        def rd(m):
            # The RD objective alone: `loss` also carries the factorized
            # priors' aux term, whose ~1e3 floor converges on a much
            # longer horizon and would mask the RD trajectory here.
            return 3141.0 * m["mse"] + m["rate"]

        params, opt = state.params, state.opt_state
        first, best = None, None
        for i in range(150):
            params, opt, metrics = step(
                params, opt, batch, jax.random.key(i)
            )
            m = jax.tree.map(float, metrics)
            if i == 0:
                first = m
            if np.isfinite(m["loss"]) and (
                best is None or rd(m) < rd(best)
            ):
                best = m

        # Assert on the best finite point of the trajectory (the training
        # CLI checkpoints the same way via BDCheckpointer), not the last
        # step, so a late lr-too-high oscillation can't flake the suite.
        assert best is not None
        assert rd(best) < 0.1 * rd(first), (first, best)
        assert best["mse"] < 0.05 * first["mse"], (first, best)
        assert best["rate"] < first["rate"], (first, best)


class TestRecursiveTrainer:
    def test_stage1_and_stage2(self, rng):
        from tpuvc.models.flowguided_b import FlowGuidedB

        model = FlowGuidedB(
            feature_channels=(16, 32, 48), N=32, M=32, levels=3,
            groups=(4, 4, 8, 16),
        )
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = model.init(
            jax.random.key(0), x, x, x, 1, 0.5, -0.5, 1, "dequantize"
        )
        tx = make_optimizer(lr_drop_step=None)
        state = init_state(variables["params"], tx)

        from tpuvc.models.flowguided_b import get_scales

        def code_fn(params, r1, r2, xc, rng_, order, o1, o2, level, dr):
            s1, s2 = get_scales(order, o1, o2)
            out = model.apply(
                {"params": params}, r1, r2, xc, level, s1, s2, dr, "ste",
                rng=rng_,
            )
            return out["x_hat"], out["rate"]

        def aux_fn(params):
            return model.apply(
                {"params": params}, method=FlowGuidedB.aux_loss
            )

        step = make_recursive_step(code_fn, aux_fn, tx, beta=0.04)
        ds = SyntheticSeptuplets(n=4, size=80)
        it = make_batch_iterator(ds, batch_size=1, crop=64, n_frames=5)
        params, opt, m1 = step(
            state.params, state.opt_state, jnp.asarray(next(it)),
            jax.random.key(1), False, 1, 1,
        )
        assert np.isfinite(float(m1["loss"]))
        params, opt, m2 = step(
            params, opt, jnp.asarray(next(it)), jax.random.key(2), True, 2, 1
        )
        assert np.isfinite(float(m2["loss"]))


class TestBDCheckpointer:
    def test_saves_on_improvement(self):
        saved = []
        ck = BDCheckpointer(
            [0.05, 0.1, 0.2], [35.0, 37.0, 39.0], save_fn=saved.append
        )
        assert ck.update([0.05, 0.1, 0.2], [35.5, 37.5, 39.5], "a")
        assert saved == ["a"]
        #

        assert not ck.update([0.05, 0.1, 0.2], [35.0, 37.0, 39.0], "b")
        assert saved == ["a"]


class TestMsSsimObjective:
    def test_rd_loss_msssim_differentiable(self, rng):
        from tpuvc.train.loss import rd_loss_msssim

        x = jnp.asarray(rng.random((1, 192, 192, 3), dtype=np.float32))
        noise = jnp.asarray(
            0.05 * rng.standard_normal((1, 192, 192, 3)).astype(np.float32)
        )

        def f(eps):
            loss, d = rd_loss_msssim(x + eps * noise, x, 0.1, alpha=8.73)
            return loss

        g = jax.grad(f)(0.3)
        assert np.isfinite(float(g))
        # distortion grows with the perturbation
        assert f(0.5) > f(0.1)

    def test_msssim_grad_finite_on_uncorrelated_input(self, rng):
        # Early in training x_hat is ~uncorrelated with x; the
        # contrast-structure term can clamp at its epsilon floor and
        # v**w must not produce an infinite gradient there.
        from tpuvc.train.loss import rd_loss_msssim

        x = jnp.asarray(rng.random((1, 192, 192, 3), dtype=np.float32))

        def f(c):
            loss, _ = rd_loss_msssim(
                jnp.full_like(x, 0.5) * c, x, 0.0, alpha=8.73
            )
            return loss

        g = jax.grad(f)(1.0)
        assert np.isfinite(float(g))

    def test_lhbdc_step_ms_ssim(self, rng):
        from tpuvc.models.lhbdc import LHBDC

        model = LHBDC(N=16)
        x = jnp.zeros((1, 192, 192, 3), jnp.float32)
        variables = model.init(jax.random.key(0), x, x, x, "dequantize")
        tx = make_optimizer(lr_drop_step=None)
        state = init_state(variables["params"], tx)
        step = make_lhbdc_step(model, tx, alpha=8.73, distortion="ms_ssim")

        ds = SyntheticSeptuplets(n=2, size=224)
        it = make_batch_iterator(ds, batch_size=1, crop=192, n_frames=3)
        params, opt, metrics = step(
            state.params, state.opt_state, jnp.asarray(next(it)),
            jax.random.key(1),
        )
        assert np.isfinite(float(metrics["loss"]))
        assert 0.0 <= float(metrics["mse"]) <= 1.0  # 1 - MS-SSIM in [0, 1]
        p0 = jax.tree.leaves(state.params)[0]
        assert float(jnp.abs(jax.tree.leaves(params)[0] - p0).sum()) > 0


class TestDmcTrainer:
    def test_cascaded_step_updates_params(self, rng):
        from tpuvc.models.dmc import PFrameDMC
        from tpuvc.train.trainer import make_dmc_step

        model = PFrameDMC(feat=8, N=16)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = model.init(
            jax.random.key(0), x,
            {"ref_frame": x, "ref_feature": None, "ref_down_ratio": 1.0},
            ratio=1.0, mode="dequantize",
        )
        tx = make_optimizer(lr_drop_step=None)
        state = init_state(variables["params"], tx)
        step = make_dmc_step(model, tx, beta=0.04, n_pframes=2,
                             warp_weight=0.1)

        ds = SyntheticSeptuplets(n=2, size=80)
        it = make_batch_iterator(ds, batch_size=2, crop=64, n_frames=3)
        batch = jnp.asarray(next(it))
        params, opt, metrics = step(
            state.params, state.opt_state, batch, jax.random.key(1), 0.0
        )
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["rate"]) > 0
        p0 = jax.tree.leaves(state.params)[0]
        assert float(jnp.abs(jax.tree.leaves(params)[0] - p0).sum()) > 0
        # q is traced: a different (fractional) level reuses the same
        # compiled graph and still yields finite metrics.
        _, _, m2 = step(params, opt, batch, jax.random.key(2), 1.5)
        assert np.isfinite(float(m2["loss"]))

    def test_quantile_params_receive_aux_updates(self, rng):
        from tpuvc.models.dmc import PFrameDMC
        from tpuvc.train.trainer import make_dmc_step

        model = PFrameDMC(feat=8, N=16)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = model.init(
            jax.random.key(0), x,
            {"ref_frame": x, "ref_feature": None, "ref_down_ratio": 1.0},
            ratio=1.0, mode="dequantize",
        )
        tx = make_optimizer(lr_drop_step=None)
        state = init_state(variables["params"], tx)
        step = make_dmc_step(model, tx, beta=0.04, n_pframes=1)
        ds = SyntheticSeptuplets(n=2, size=80)
        it = make_batch_iterator(ds, batch_size=1, crop=64, n_frames=2)
        params, _, _ = step(
            state.params, state.opt_state, jnp.asarray(next(it)),
            jax.random.key(1), 0.0,
        )

        def quantile_leaves(tree):
            return [
                v for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]
                if any(getattr(k, "key", None) == "quantiles" for k in p)
            ]

        before = quantile_leaves(state.params)
        after = quantile_leaves(params)
        assert before and sum(
            float(jnp.abs(a - b).sum()) for a, b in zip(after, before)
        ) > 0


class TestLoaderWorkers:
    def test_stream_identical_across_worker_counts(self):
        ds = SyntheticSeptuplets(n=8, size=80)
        it0 = make_batch_iterator(ds, batch_size=2, crop=64, seed=7)
        it4 = make_batch_iterator(
            ds, batch_size=2, crop=64, seed=7, workers=4, prefetch=2
        )
        for _ in range(3):
            np.testing.assert_array_equal(next(it0), next(it4))

    def test_five_frame_workers(self):
        ds = SyntheticSeptuplets(n=4, size=80)
        it = make_batch_iterator(
            ds, batch_size=1, crop=64, n_frames=5, workers=2, prefetch=1
        )
        assert next(it).shape == (1, 5, 64, 64, 3)


class TestSkipNonfinite:
    def test_nan_grad_step_leaves_params_unchanged(self, rng):
        from tpuvc.models.lhbdc import LHBDC

        model = LHBDC(N=16)
        x = jnp.zeros((1, 192, 192, 3), jnp.float32)
        variables = model.init(jax.random.key(0), x, x, x, "dequantize")
        tx = make_optimizer(lr_drop_step=None, skip_nonfinite=5)
        state = init_state(variables["params"], tx)
        step = make_lhbdc_step(model, tx, alpha=1626.0)

        ds = SyntheticSeptuplets(n=2, size=224)
        it = make_batch_iterator(ds, batch_size=1, crop=192, n_frames=3)
        good = jnp.asarray(next(it))
        bad = good.at[0, 1, 0, 0, 0].set(jnp.nan)

        params, opt, m = step(
            state.params, state.opt_state, bad, jax.random.key(1)
        )
        # NaN batch -> update dropped, every param bit-identical.
        same = jax.tree.map(
            lambda a, b: bool(jnp.all(a == b)), state.params, params
        )
        assert all(jax.tree.leaves(same))

        params2, opt2, m2 = step(params, opt, good, jax.random.key(2))
        assert np.isfinite(float(m2["loss"]))
        p0 = jax.tree.leaves(params)[0]
        assert float(jnp.abs(jax.tree.leaves(params2)[0] - p0).sum()) > 0
