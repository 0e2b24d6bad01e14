import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvc.gop.adaptive import fractional_ratio_search
from tpuvc.models.dmc import PFrameDMC


@pytest.fixture(scope="module")
def dmc():
    model = PFrameDMC(feat=16, N=32)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    dpb = {"ref_frame": x, "ref_feature": None, "ref_down_ratio": 1.0}
    variables = model.init(jax.random.key(0), x, dpb, 1.0, "dequantize")
    return model, variables


def _pair(rng, shape=(1, 128, 128, 3)):
    base = rng.random(shape, dtype=np.float32)
    drift = 0.03 * rng.standard_normal(shape).astype(np.float32)
    return jnp.asarray(base), jnp.clip(jnp.asarray(base + drift), 0, 1)


class TestPFrameDMC:
    def test_first_p_frame(self, dmc, rng):
        model, variables = dmc
        ref, x = _pair(rng)
        dpb = {"ref_frame": ref, "ref_feature": None, "ref_down_ratio": 1.0}
        out = model.apply(variables, x, dpb, 1.0, "dequantize")
        assert out["x_hat"].shape == x.shape
        assert float(out["bits"]) > 0
        assert out["dpb"]["ref_feature"].shape[-1] == 16

    def test_chained_frames_propagate_dpb(self, dmc, rng):
        model, variables = dmc
        ref, x1 = _pair(rng)
        dpb = {"ref_frame": ref, "ref_feature": None, "ref_down_ratio": 1.0}
        out1 = model.apply(variables, x1, dpb, 1.0, "dequantize")
        x2 = jnp.clip(x1 + 0.02, 0, 1)
        # Second frame uses the propagated feature (different param path).
        out2 = model.apply(variables, x2, out1["dpb"], 1.0, "dequantize")
        assert np.isfinite(float(out2["bits"]))

    def test_fractional_ratio_coding(self, dmc, rng):
        model, variables = dmc
        ref, x = _pair(rng)
        dpb = {"ref_frame": ref, "ref_feature": None, "ref_down_ratio": 1.0}
        out = model.apply(variables, x, dpb, 2.5, "dequantize")
        assert out["x_hat"].shape == x.shape
        assert out["dpb"]["ref_down_ratio"] == 2.5

    def test_ratio_search_with_hysteresis(self, dmc, rng):
        model, variables = dmc
        ref, x = _pair(rng)

        def predict(ratio):
            return model.apply(
                variables, x, ref, ratio, method=PFrameDMC.warp_prediction
            )

        ratio, psnr, best = fractional_ratio_search(
            predict, x, prev_ratio=1.0, ratios=(1.0, 2.0, 4.0)
        )
        assert ratio in (1.0, 2.0, 4.0)
        assert np.isfinite(psnr)

    @pytest.mark.slow
    def test_grads(self, dmc, rng):
        model, variables = dmc
        ref, x = _pair(rng)
        dpb = {"ref_frame": ref, "ref_feature": None, "ref_down_ratio": 1.0}

        def loss(p):
            out = model.apply(
                {"params": p}, x, dpb, 1.0, "ste", rng=jax.random.key(1)
            )
            return 0.01 * 255**2 * jnp.mean((out["x_hat"] - x) ** 2) + out[
                "rate"
            ]

        g = jax.grad(loss)(variables["params"])
        total = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
        assert np.isfinite(total) and total > 0


class TestPFrameSequence:
    def test_low_delay_eval(self, dmc, rng):
        import jax

        from tpuvc.eval.pframe_runner import eval_pframe_sequence
        from tpuvc.eval.results_io import PerFrameDiagnostics

        model, variables = dmc
        base = rng.random((1, 128, 128, 3), dtype=np.float32)
        drift = 0.01 * rng.standard_normal((1, 128, 128, 3)).astype(np.float32)
        frames = [
            jnp.clip(jnp.asarray(base + i * drift), 0, 1) for i in range(5)
        ]

        def intra_fn(x):
            return x, 1000.0

        def pframe_fn(x, dpb, ratio):
            out = model.apply(variables, x, dpb, ratio, "dequantize")
            return out

        def warp_pred_fn(x, ref, ratio):
            return model.apply(
                variables, x, ref, ratio, method=PFrameDMC.warp_prediction
            )

        diag = PerFrameDiagnostics()
        psnrs, sizes = eval_pframe_sequence(
            frames, 5, intra_fn, pframe_fn, warp_pred_fn,
            crop_hw=(120, 120), ratios=(1.0, 2.0), diagnostics=diag,
        )
        assert len(psnrs) == 5
        assert all(np.isfinite(p) for p in psnrs[1:])
        assert len(diag.rows) == 5
        assert diag.rows[1]["type"] == "P"
        assert diag.rows[1]["down_ratio"] in (1.0, 2.0)


class TestDMCRateLevels:
    def test_q_changes_rate(self, dmc, rng):
        model, variables = dmc
        ref, x = _pair(rng)
        dpb = {"ref_frame": ref, "ref_feature": None, "ref_down_ratio": 1.0}
        # Spread the gains so levels differ even untrained.
        p = variables["params"]
        for coder in ("mv_coder", "y_coder"):
            g = np.ones((4, 32), np.float32)
            for i in range(4):
                g[i] *= 2.0**i
            p[coder]["gain"] = jnp.asarray(g)
        sizes = []
        for q in (0.0, 2.0):
            out = model.apply(variables, x, dpb, 1.0, "dequantize", q=q)
            sizes.append(float(out["bits"]))
        assert sizes[1] > sizes[0]

    def test_fractional_q(self, dmc, rng):
        model, variables = dmc
        ref, x = _pair(rng)
        dpb = {"ref_frame": ref, "ref_feature": None, "ref_down_ratio": 1.0}
        out = model.apply(variables, x, dpb, 1.0, "dequantize", q=1.5)
        assert np.isfinite(float(out["bits"]))
