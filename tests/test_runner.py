"""End-to-end sequence evaluation through the runner (synthetic frames,
random-init codec — verifies plumbing, ordering, and accounting)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvc.data.uvg import SyntheticSequence
from tpuvc.eval.infographic import TestInfographic
from tpuvc.eval.runner import eval_sequence
from tpuvc.gop.order import get_order_typ_list

pytestmark = pytest.mark.slow


class TestEvalSequence:
    def test_lhbdc_sequence(self, rng):
        from tpuvc.models.lhbdc import LHBDC

        model = LHBDC(N=16)
        x = jnp.zeros((1, 192, 192, 3), jnp.float32)
        variables = model.init(jax.random.key(0), x, x, x, "dequantize")

        seq = SyntheticSequence(n_frames=17, h=160, w=180)
        order, typ = get_order_typ_list(16, len(seq))
        frames = [jnp.asarray(seq[i]) for i in range(len(seq))]

        def intra_fn(xf):
            # Stand-in intra codec: lossy identity at a fixed cost.
            return xf, 1000.0

        @jax.jit
        def inter_j(v, r1, r2, xc):
            out = model.apply(v, r1, xc, r2, "dequantize")
            return out["x_hat"], out["bits"]

        def inter_fn(r1, r2, xc, order, o1, o2):
            return inter_j(variables, r1, r2, xc)

        info = TestInfographic()
        psnrs, sizes = eval_sequence(
            frames, order, typ, intra_fn, inter_fn,
            crop_hw=seq.size, video="synt", level=0, info=info,
        )
        assert len(psnrs) == 17
        # I-frames are identity -> infinite PSNR; B-frames finite.
        assert np.isinf(psnrs[0]) and np.isinf(psnrs[16])
        assert all(np.isfinite(p) for i, p in enumerate(psnrs) if typ[i] == "B")
        assert all(s > 0 for s in sizes)
        df = info.dataframe()
        assert len(df) == 17
        assert set(df["type"]) == {"I", "B"}
        # Coding order respected: every B coded after its refs existed.
        per_level = info.per_level()
        assert len(per_level) == 1

    def test_msssim_column(self):
        """compute_msssim=True records a finite msssim per frame in the
        ledger (the LHBDC MS-SSIM RD protocol)."""
        seq = SyntheticSequence(n_frames=3, h=176, w=176)
        frames = [jnp.asarray(seq[i]) for i in range(len(seq))]
        order, typ = [0, 2, 1], ["I", "B", "I"]

        def intra_fn(xf):
            return jnp.clip(xf + 0.01, 0, 1), 1000.0

        def inter_fn(r1, r2, xc, order, o1, o2):
            return jnp.clip(xc + 0.02, 0, 1), 500.0

        info = TestInfographic(extra_columns=("msssim",))
        eval_sequence(
            frames, order, typ, intra_fn, inter_fn, crop_hw=seq.size,
            video="synt", level=0, info=info, compute_msssim=True,
        )
        df = info.dataframe()
        assert "msssim" in df.columns
        assert df["msssim"].between(0.0, 1.0).all()
        assert df["msssim"].notna().all()


class TestEvalSequenceBatched:
    def test_matches_sequential_runner(self, rng):
        """Level-batched sequence eval must agree with the sequential
        protocol path (same codec, same frames, GOP-8)."""
        from tpuvc.eval.runner import eval_sequence_batched
        from tpuvc.models.lhbdc import LHBDC

        model = LHBDC(N=16)
        x = jnp.zeros((1, 128, 128, 3), jnp.float32)
        variables = model.init(jax.random.key(0), x, x, x, "dequantize")

        from tpuvc.gop.order import sequence_order_from_table

        seq = SyntheticSequence(n_frames=17, h=128, w=128)
        frames = [jnp.asarray(seq[i]) for i in range(len(seq))]
        order, typ = sequence_order_from_table(8, len(seq))

        def intra_fn(xf):
            return jnp.clip(xf + 0.01, 0, 1), 1000.0

        @jax.jit
        def fwd(v, r1, r2, xc):
            out = model.apply(v, r1, xc, r2, "dequantize")
            return out["x_hat"], out["sizes"]

        def inter_seq(r1, r2, xc, order_, o1, o2):
            x_hat, s = fwd(variables, r1, r2, xc)
            return x_hat, s[0]

        def inter_batched(r1, r2, xc, idxs, refs):
            return fwd(variables, r1, r2, xc)

        p_seq, s_seq = eval_sequence(
            frames, order, typ, intra_fn, inter_seq, crop_hw=seq.size
        )
        p_bat, s_bat = eval_sequence_batched(
            frames, len(seq), 8, intra_fn, inter_batched,
            crop_hw=seq.size,
        )
        assert len(p_bat) == 17
        for i in range(17):
            # Same protocol up to batched-vs-sequential float accumulation.
            assert abs(p_seq[i] - p_bat[i]) < 0.1, i
            assert abs(s_seq[i] - s_bat[i]) < max(2e-3 * s_seq[i], 4.0), i

    def test_prefix_truncation(self, rng):
        """A 21-frame sequence covers only the 17-frame (2x GOP-8) prefix."""
        from tpuvc.eval.runner import eval_sequence_batched

        seq = SyntheticSequence(n_frames=21, h=96, w=96)
        frames = [jnp.asarray(seq[i]) for i in range(len(seq))]

        def intra_fn(xf):
            return xf, 100.0

        def inter_batched(r1, r2, xc, idxs, refs):
            return xc, jnp.full((xc.shape[0],), 50.0)

        p, s = eval_sequence_batched(
            frames, len(seq), 8, intra_fn, inter_batched, crop_hw=seq.size
        )
        assert len(p) == 17 and len(s) == 17
        assert all(v > 0 for v in s)


class TestLowDelayRunner:
    def test_schedule_and_diag(self):
        """I every intra_period, P chained; diagnostics ledger filled."""
        from tpuvc.data.uvg import SyntheticSequence
        from tpuvc.eval.results_io import PerFrameDiagnostics
        from tpuvc.eval.runner import eval_sequence_lowdelay

        seq = SyntheticSequence(n_frames=9, h=64, w=64)
        frames = [jnp.asarray(seq[i]) for i in range(len(seq))]
        coded = []

        def intra_fn(x):
            coded.append("I")
            return x, 400.0

        def pframe_fn(x, dpb, ratio):
            coded.append("P")
            assert set(dpb) >= {"ref_frame", "ref_down_ratio"}
            new_dpb = {"ref_frame": x, "ref_feature": None,
                       "ref_down_ratio": ratio}
            return x, 120.0, new_dpb, {"warp_psnr": 30.0, "bits_mv": 20.0,
                                       "bits_y": 100.0}

        searched = []

        def ratio_for_frame(x, dpb):
            searched.append(dpb["ref_down_ratio"])
            return 2.0

        diag = PerFrameDiagnostics()
        psnrs, sizes = eval_sequence_lowdelay(
            frames, 9, 4, intra_fn, pframe_fn, crop_hw=seq.size,
            ratio_for_frame=ratio_for_frame, diagnostics=diag,
        )
        assert coded == ["I", "P", "P", "P", "I", "P", "P", "P", "I"]
        assert len(psnrs) == 9 and len(sizes) == 9
        assert sizes[0] == 400.0 and sizes[1] == 120.0
        # Hysteresis sees the previous frame's chosen ratio.
        assert searched == [1.0, 2.0, 2.0, 1.0, 2.0, 2.0]
        rows = diag.rows
        assert [r["type"] for r in rows] == coded
        assert rows[1]["down_ratio"] == 2.0 and rows[0]["down_ratio"] == 1.0
        assert rows[1]["bits_mv"] == 20.0
