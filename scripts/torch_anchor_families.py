"""Per-family PyTorch-CPU anchors at 1080p: the reference's OWN code.

VERDICT r3 Missing #4: vs_baseline was evidenced for LHBDC only
(scripts/torch_anchor.py, a compute-equivalent hand model). With the
tests/refshim compressai/torchvision shims the reference's own model code
executes on torch-cpu, so the flexrate/v3/v4 anchors time the genuine
reference forwards (random init, eval mode) at 1088x1920:

  flexrate  /root/reference/Flex-Rate…/b_model/b_model.py forward
  deform_b  /root/reference/ICIP2023/src/model/m.py forward
  flowguided_b /root/reference/ICIP2024/src/model/m.py forward

Caveats, recorded in the JSON: (a) deformable convolution runs through the
shim's vectorized-eager torch oracle (tests/refshim/torchvision), not
torchvision's C++ CPU kernel — `deform_frac` reports the fraction of the
forward spent there so readers can discount it; (b) the OJSP DMC reference
cannot execute (its DCVC base modules are absent from /root/reference), so
no executable DMC anchor exists — scripts/torch_anchor.py's approach
(compute-equivalent hand model) would be the fallback.

One JSON line per family:
  {"family": ..., "torch_cpu_fps": ..., "seconds_per_frame": ...,
   "deform_s": ..., "threads": ..., "resolution": "1088x1920"}

Usage: python scripts/torch_anchor_families.py [family ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.join(REPO, "tests", "refshim"))

import torch  # noqa: E402

H, W = 1088, 1920


class _DeformTimer:
    """Accumulates wall time spent inside the shim deform_conv2d."""

    def __init__(self):
        self.total = 0.0

    def install(self):
        import torchvision.ops.deform_conv as dc

        orig = dc.deform_conv2d

        def timed(*a, **k):
            t0 = time.perf_counter()
            out = orig(*a, **k)
            self.total += time.perf_counter() - t0
            return out

        dc.deform_conv2d = timed
        # DeformConv2d.forward closes over the module-level name at call
        # time only if it resolves through the module; it calls the global.
        return self


def _frames(n=3, h=H, w=W, seed=0):
    g = torch.Generator().manual_seed(seed)
    return [torch.rand(1, 3, h, w, generator=g) for _ in range(n)]


def _measure(build, run, warm_hw=(192, 256)):
    torch.manual_seed(0)
    model = build().eval()
    with torch.no_grad():
        run(model, *_frames(h=warm_hw[0], w=warm_hw[1]))  # warm allocator
        dt_def = _DeformTimer().install()
        t0 = time.perf_counter()
        run(model, *_frames())
        dt = time.perf_counter() - t0
    return dt, dt_def.total


def anchor_flexrate():
    from refload import flexrate_model

    bm = flexrate_model()

    def run(m, xb, xc, xa):
        out = m(xb, xc, xa, n=[2], l=1, train=False)
        assert torch.isfinite(out["size"].sum())

    return _measure(lambda: bm.BidirFlowRef(n=6, N=128), run)


def anchor_deform_b():
    from refload import icip2023_model

    m23 = icip2023_model()

    def run(m, xb, xc, xa):
        out = m(xb, xa, xc, 1)
        assert torch.isfinite(out["size"])

    return _measure(lambda: m23.DeformB(), run)


def anchor_flowguided_b():
    from refload import icip2024_model

    m24 = icip2024_model()

    def run(m, xb, xc, xa):
        out = m(xb, xa, 0.5, -0.5, xc, 1, 1)
        assert torch.isfinite(out["size"])

    return _measure(lambda: m24.FlowGuidedB(), run)


def anchor_dmc():
    """The OJSP DMC reference cannot execute (its DCVC-FM base modules are
    absent from /root/reference — OJSP2025/video_model.py:12-17 imports
    them), so this anchor is a compute-equivalent hand model of the same
    P-frame forward (tpuvc/models/dmc.py structure = the informed
    reconstruction): SPyNet ME, MV codec with four-part hyper, 48-ch
    feature context warp + refinement, conditional contextual codec with
    reconstruction head. Same approach as scripts/torch_anchor.py."""
    import math

    import torch.nn.functional as F
    from torch import nn

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torch_anchor import SPyNet, Subpel, gaussian_bits, warp

    FEAT, N = 48, 64

    class RBB(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.c1 = nn.Conv2d(c, c // 2, 1)
            self.c2 = nn.Conv2d(c // 2, c // 2, 3, padding=1)
            self.c3 = nn.Conv2d(c // 2, c, 1)

        def forward(self, x):
            h = F.relu(self.c1(x))
            h = F.relu(self.c2(h))
            return x + self.c3(h)

    class FourPartCoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.h_a = nn.Sequential(
                nn.Conv2d(N, N, 3, padding=1), nn.ReLU(),
                nn.Conv2d(N, N, 5, stride=2, padding=2), nn.ReLU(),
                nn.Conv2d(N, N, 5, stride=2, padding=2),
            )
            self.h_s = nn.Sequential(
                Subpel(N, N), nn.ReLU(),
                Subpel(N, N * 3 // 2), nn.ReLU(),
                nn.Conv2d(N * 3 // 2, 2 * N, 3, padding=1),
            )
            self.fusion1 = nn.Conv2d(4 * N, 3 * N, 1)
            self.adaptors = nn.ModuleList(
                nn.Conv2d(3 * N, 2 * N, 3, padding=1) for _ in range(4)
            )

        def forward(self, y):
            z = self.h_a(y)
            p = self.h_s(torch.round(z))
            p = self.fusion1(torch.cat([p, p[:, :2 * N]], 1))
            bits = gaussian_bits(z, torch.ones_like(z), torch.zeros_like(z))
            for ad in self.adaptors:  # four-part spatial prior passes
                sm = ad(p)
                scales, means = sm.chunk(2, 1)
                bits = bits + gaussian_bits(y, scales, means) / 4.0
            return torch.round(y), bits

    class DMCTorch(nn.Module):
        def __init__(self):
            super().__init__()
            self.flownet = SPyNet()
            self.mv_a = nn.Sequential(
                nn.Conv2d(10, N, 5, stride=2, padding=2), nn.ReLU(),
                nn.Conv2d(N, N, 5, stride=2, padding=2), nn.ReLU(),
                nn.Conv2d(N, N, 5, stride=2, padding=2),
            )
            self.mv_coder = FourPartCoder()
            self.mv_s = nn.Sequential(
                Subpel(N, N), nn.ReLU(), Subpel(N, N), nn.ReLU(),
                Subpel(N, 8),
            )
            self.mv_out = nn.Conv2d(8, 2, 3, padding=1)
            self.feat_in = nn.Conv2d(3 + FEAT, FEAT, 3, padding=1)
            self.feat_blocks = nn.ModuleList(RBB(FEAT) for _ in range(2))
            self.ctx_refine = nn.ModuleList(
                [nn.Conv2d(FEAT + 3 + 2, FEAT, 3, padding=1), RBB(FEAT),
                 RBB(FEAT)]
            )
            self.g_a = nn.Sequential(
                nn.Conv2d(3 + FEAT, N, 5, stride=2, padding=2), nn.ReLU(),
                nn.Conv2d(N, N, 5, stride=2, padding=2), nn.ReLU(),
                nn.Conv2d(N, N, 5, stride=2, padding=2),
            )
            self.y_coder = FourPartCoder()
            self.g_s = nn.Sequential(
                Subpel(N, N), nn.ReLU(), Subpel(N, N), nn.ReLU(),
                Subpel(N, FEAT),
            )
            self.recon = nn.ModuleList(
                [nn.Conv2d(2 * FEAT, FEAT, 3, padding=1), RBB(FEAT),
                 RBB(FEAT)]
            )
            self.to_rgb = nn.Conv2d(FEAT, 3, 3, padding=1)

        def forward(self, x, ref):
            b, _, h, w = x.shape
            flow = self.flownet(x, ref)
            mvf = torch.zeros(b, 8, h, w)
            y_mv = self.mv_a(torch.cat([flow, mvf], 1))
            y_mv_hat, mv_bits = self.mv_coder(y_mv)
            dec = self.mv_s(y_mv_hat)
            mv_hat = self.mv_out(dec)
            f = self.feat_in(torch.cat([ref, torch.zeros(b, FEAT, h, w)], 1))
            for blk in self.feat_blocks:
                f = blk(f)
            wf = warp(f, mv_hat)
            wx = warp(ref, mv_hat)
            ctx = torch.cat([wf, wx, mv_hat], 1)
            c = self.ctx_refine[0](ctx)
            for blk in self.ctx_refine[1:]:
                c = blk(c)
            y = self.g_a(torch.cat([x, c], 1))
            y_hat, y_bits = self.y_coder(y)
            g = self.g_s(y_hat)
            r = self.recon[0](torch.cat([g, c], 1))
            for blk in self.recon[1:]:
                r = blk(r)
            x_hat = self.to_rgb(r)
            return x_hat, mv_bits + y_bits

    def run(m, xb, xc, xa):
        _, bits = m(xc, xb)
        assert torch.isfinite(bits)

    return _measure(DMCTorch, run)


ANCHORS = {
    "flexrate": anchor_flexrate,
    "deform_b": anchor_deform_b,
    "flowguided_b": anchor_flowguided_b,
    "dmc": anchor_dmc,
}


def main():
    fams = sys.argv[1:] or list(ANCHORS)
    for fam in fams:
        dt, dt_def = ANCHORS[fam]()
        print(
            json.dumps(
                {
                    "family": fam,
                    "torch_cpu_fps": round(1.0 / dt, 5),
                    "seconds_per_frame": round(dt, 2),
                    "deform_s": round(dt_def, 2),
                    "threads": torch.get_num_threads(),
                    "resolution": f"{H}x{W}",
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
