import jax.numpy as jnp
import numpy as np
import pytest

from tpuvc.eval.bd_rate import ANCHORS, bd_psnr, bd_rate
from tpuvc.eval.infographic import TestInfographic
from tpuvc.eval.metrics import msssim, psnr, psnr_uint8
from tpuvc.gop.dpb import DecodedPictureBuffer
from tpuvc.gop.order import (
    GOP8_ORDER,
    GOP16_ORDER,
    get_order_typ_list,
    gop_coding_table,
)


class TestOrders:
    def test_gop8_table(self):
        t = gop_coding_table(8)
        assert t.order == GOP8_ORDER
        assert t.refs[4] == (0, 8)
        assert t.refs[7] == (6, 8)

    def test_gop16_refs_are_dyadic(self):
        t = gop_coding_table(16)
        assert t.order == GOP16_ORDER
        for f, (a, b) in t.refs.items():
            assert a < f < b and (a + b) // 2 == f

    def test_generic_gop32(self):
        t = gop_coding_table(32)
        assert sorted(t.order) == list(range(33))
        # Every frame coded after both its references.
        pos = {f: i for i, f in enumerate(t.order)}
        for f, (a, b) in t.refs.items():
            assert pos[a] < pos[f] and pos[b] < pos[f]

    def test_levels_group_independent_frames(self):
        t = gop_coding_table(16)
        levels = t.frames_by_level()
        assert levels[0] == [8]
        assert sorted(levels[1]) == [4, 12]
        assert sorted(levels[3]) == [1, 3, 5, 7, 9, 11, 13, 15]

    def test_get_order_typ_list_basic(self):
        o, typ = get_order_typ_list(16, 33)
        assert sorted(o) == list(range(33))
        assert o[0] == 0 and o[1] == 16
        assert typ[0] == "I" and typ[16] == "I" and typ[32] == "I"
        assert typ[5] == "B"

    def test_get_order_typ_list_uvg_lengths(self):
        for n in (300, 600):
            o, typ = get_order_typ_list(16, n)
            assert sorted(o) == list(range(n)), f"n={n}"
            assert typ[-1] == "I"
        # Coding validity: each B coded after 2 nearest-anchor candidates
        # exist is checked in the runner; here just order sanity.
        o, _ = get_order_typ_list(16, 600)
        assert o[-7:] == [599, 595, 593, 597, 594, 596, 598]


class TestDPB:
    def test_single_reference(self):
        dpb = DecodedPictureBuffer()
        dpb.add("f0", 0)
        r1, r2, o1, o2 = dpb.select_references(5)
        assert r1 == r2 == "f0" and o1 == o2 == 0

    def test_two_nearest(self):
        dpb = DecodedPictureBuffer()
        for o in (0, 16, 8):
            dpb.add(f"f{o}", o)
        r1, r2, o1, o2 = dpb.select_references(4)
        assert (o1, o2) == (0, 8)
        r1, r2, o1, o2 = dpb.select_references(12)
        assert (o1, o2) == (8, 16)

    def test_capacity_eviction(self):
        dpb = DecodedPictureBuffer(capacity=3)
        for o in range(5):
            dpb.add(f"f{o}", o)
        assert len(dpb) == 3 and dpb.orders == [2, 3, 4]


class TestMetrics:
    def test_psnr_identity_is_inf(self):
        x = jnp.ones((1, 8, 8, 3)) * 0.5
        assert np.isinf(float(psnr_uint8(x, x)))

    def test_psnr_known_value(self):
        a = jnp.zeros((1, 4, 4, 1))
        b = jnp.full((1, 4, 4, 1), 10.0 / 255.0)
        # MSE in uint8 domain = 100 -> PSNR = 10*log10(255^2/100)
        np.testing.assert_allclose(
            float(psnr_uint8(a, b)), 10 * np.log10(255**2 / 100), rtol=1e-5
        )

    def test_msssim_range(self, rng):
        a = jnp.asarray(rng.random((1, 192, 192, 3), dtype=np.float32))
        noise = 0.05 * rng.standard_normal((1, 192, 192, 3)).astype(np.float32)
        b = jnp.clip(a + noise, 0, 1)
        v = float(msssim(a, b))
        assert 0.5 < v < 1.0
        assert float(msssim(a, a)) > 0.999


class TestBDRate:
    def test_identical_curves_zero(self):
        r, p = ANCHORS["elfvc"]
        assert abs(bd_rate(r, p, r, p)) < 1e-9
        assert abs(bd_psnr(r, p, r, p)) < 1e-9

    def test_better_curve_negative_bd_rate(self):
        r, p = ANCHORS["elfvc"]
        better_p = [x + 0.5 for x in p]
        assert bd_rate(r, p, r, better_p) < -5
        assert bd_psnr(r, p, r, better_p) == pytest.approx(0.5, abs=1e-6)

    def test_piecewise_close_to_poly(self):
        r, p = ANCHORS["elfvc"]
        r2, p2 = ANCHORS["lhbdc"]
        a = bd_rate(r, p, r2, p2)
        b = bd_rate(r, p, r2, p2, piecewise=True)
        assert abs(a - b) < 5.0


class TestInfographicLedger:
    def test_aggregations(self):
        info = TestInfographic()
        for video in ("beauty", "jockey"):
            for level in (0, 1):
                for f in range(4):
                    info.update(
                        video, level, f, "B" if f else "I",
                        psnr=30 + level, size=1000 * (level + 1),
                        pixels=1080 * 1920,
                    )
        per_level = info.per_level()
        assert len(per_level) == 2
        np.testing.assert_allclose(per_level["psnr"], [30.0, 31.0])
        np.testing.assert_allclose(
            per_level["bpp"], [1000 / (1080 * 1920), 2000 / (1080 * 1920)]
        )

    def test_results_csv(self, tmp_path):
        info = TestInfographic()
        info.update("beauty", 0, 0, "I", 30.0, 1000, 100)
        out = info.results_csv(tmp_path / "results.csv")
        assert list(out.columns) == ["level", "sequence", "psnr", "bpp"]
        assert (tmp_path / "results.csv").exists()


class TestPlots:
    def test_rd_curve_and_per_frame(self, tmp_path):
        from tpuvc.eval.plots import per_frame_figure, rd_curve

        p1 = rd_curve(
            {"tpuvc": ([0.05, 0.1, 0.2], [36.0, 37.5, 39.0])},
            str(tmp_path / "rd.png"),
        )
        p2 = per_frame_figure(
            [35.0, 36.0, 35.5], [1000, 500, 700], 1080 * 1920,
            str(tmp_path / "pf.png"),
        )
        import os

        assert os.path.getsize(p1) > 0 and os.path.getsize(p2) > 0


class TestResultsIO:
    def test_rd_txt(self, tmp_path):
        from tpuvc.eval.results_io import write_rd_txt

        p = write_rd_txt(
            str(tmp_path / "psnr_bpp.txt"), "tpuvc", "PSNR",
            [(0.0457, 35.43), (0.0648, 36.53)],
            {"beauty": [(0.0226, 33.89)]},
        )
        text = open(p).read()
        assert "0.0457,    35.43" in text
        assert "# beauty sequence" in text

    def test_per_frame_diagnostics(self, tmp_path):
        from tpuvc.eval.results_io import PerFrameDiagnostics

        d = PerFrameDiagnostics()
        d.update(frame=0, type="I", psnr=38.0, bits=1e5, bpp=0.05)
        d.update(frame=1, type="P", down_ratio=2.5, psnr=36.5, warp_psnr=30.1,
                 bits=5e4, bpp=0.025, bits_mv=1e4, bits_y=4e4)
        p = d.write(str(tmp_path / "diag.csv"))
        rows = open(p).read().strip().splitlines()
        assert len(rows) == 3 and rows[0].startswith("frame,")


class TestSequenceOrderFromTable:
    def test_gop8_sequence(self):
        from tpuvc.gop.order import sequence_order_from_table

        order, typ = sequence_order_from_table(8, 25)
        assert sorted(order) == list(range(25))
        assert typ[0] == "I" and typ[8] == "I" and typ[16] == "I"
        assert typ[24] == "I" and typ[5] == "B"
        # Every B-frame appears after both dyadic anchors of its GOP.
        pos = {f: i for i, f in enumerate(order)}
        from tpuvc.gop.order import gop_coding_table

        t = gop_coding_table(8)
        for start in (0, 8, 16):
            for f, (a, b) in t.refs.items():
                assert pos[start + a] < pos[start + f]
                assert pos[start + b] < pos[start + f]

    def test_partial_tail(self):
        from tpuvc.gop.order import sequence_order_from_table

        order, typ = sequence_order_from_table(8, 21)
        assert sorted(order) == list(range(21))
        assert typ[-1] == "I"
