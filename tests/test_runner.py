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
