"""Measure the reference-equivalent PyTorch-CPU LHBDC B-frame forward at 1080p.

VERDICT.md (round 1) flagged that bench.py normalized against an *estimated*
0.1 fps CPU anchor. This script puts the anchor on evidence: a PyTorch
(eager, CPU) implementation of the LHBDC B-frame eval forward with the same
compute structure as the reference (/root/reference/LHBDC/model/m.py:20-108):

  - 4 SPyNet 6-level pyramids (Basic = 5x conv7x7, 8->32->64->32->16->2,
    flow.py:30-101) per B-frame,
  - mean-scale hyperprior MV codec over the 4ch flow difference at /4 res
    (layers.py:43-116: g_a = 3x(ResBlockStride+ResBlock)+conv/2 to /16,
    h_a 5 convs, h_s subpel x4 up, g_s mirror with IGDN upsample blocks),
  - bilinear grid_sample warps of both refs + 3-down/3-up mask UNet blend,
  - residual hyperprior codec (3ch, full res),
  - Gaussian likelihood -> bits accounting.

The entropy *transforms* dominate; compressai's factorized-bottleneck
likelihood (a per-channel 5-layer 1d MLP) is approximated by a Gaussian
likelihood on z — FLOP-negligible either way, and compressai is not
installed here. No reference code is used; modules are written from the
architecture spec in SURVEY.md 2.1.

Prints one JSON line: {"torch_cpu_fps": ..., "seconds_per_frame": ...,
"threads": ..., "resolution": "1088x1920"}.
"""

from __future__ import annotations

import json
import math
import time

import torch
import torch.nn.functional as F
from torch import nn


class Basic(nn.Module):
    def __init__(self):
        super().__init__()
        chans = [8, 32, 64, 32, 16, 2]
        self.convs = nn.ModuleList(
            nn.Conv2d(chans[i], chans[i + 1], 7, padding=3)
            for i in range(5)
        )

    def forward(self, x):
        for i, c in enumerate(self.convs):
            x = c(x)
            if i < 4:
                x = F.relu(x)
        return x


def warp(x, flow):
    b, _, h, w = x.shape
    ys = torch.linspace(-1, 1, h).view(1, h, 1).expand(b, h, w)
    xs = torch.linspace(-1, 1, w).view(1, 1, w).expand(b, h, w)
    grid = torch.stack([xs, ys], dim=-1)
    norm = torch.tensor([2.0 / max(w - 1, 1), 2.0 / max(h - 1, 1)])
    grid = grid + flow.permute(0, 2, 3, 1) * norm
    return F.grid_sample(x, grid, align_corners=True, padding_mode="border")


class SPyNet(nn.Module):
    def __init__(self, levels=6):
        super().__init__()
        self.blocks = nn.ModuleList(Basic() for _ in range(levels))

    def forward(self, first, second):
        firsts, seconds = [first], [second]
        for _ in range(5):
            if firsts[0].shape[-2] > 32 or firsts[0].shape[-1] > 32:
                firsts.insert(0, F.avg_pool2d(firsts[0], 2))
                seconds.insert(0, F.avg_pool2d(seconds[0], 2))
        flow = torch.zeros(
            first.shape[0], 2, firsts[0].shape[-2], firsts[0].shape[-1]
        )
        for lvl, (f1, f2) in enumerate(zip(firsts, seconds)):
            if lvl:
                flow = (
                    F.interpolate(
                        flow, scale_factor=2, mode="bilinear",
                        align_corners=True,
                    )
                    * 2.0
                )
            inp = torch.cat([f1, warp(f2, flow), flow], dim=1)
            flow = flow + self.blocks[min(lvl, len(self.blocks) - 1)](inp)
        return flow


class GDN(nn.Module):
    def __init__(self, c, inverse=False):
        super().__init__()
        self.inverse = inverse
        self.beta = nn.Parameter(torch.ones(c))
        self.gamma = nn.Parameter(0.1 * torch.eye(c))

    def forward(self, x):
        b, c, h, w = x.shape
        norm = F.conv2d(x * x, self.gamma.view(c, c, 1, 1), self.beta)
        norm = torch.sqrt(torch.clamp(norm, min=1e-9))
        return x * norm if self.inverse else x / norm


class ResBlock(nn.Module):
    def __init__(self, cin, c):
        super().__init__()
        self.c1 = nn.Conv2d(cin, c, 3, padding=1)
        self.c2 = nn.Conv2d(c, c, 3, padding=1)
        self.skip = nn.Conv2d(cin, c, 1) if cin != c else None

    def forward(self, x):
        out = F.leaky_relu(self.c1(x))
        out = F.leaky_relu(self.c2(out))
        return out + (self.skip(x) if self.skip else x)


class ResBlockStride(nn.Module):
    def __init__(self, cin, c):
        super().__init__()
        self.c1 = nn.Conv2d(cin, c, 3, stride=2, padding=1)
        self.c2 = nn.Conv2d(c, c, 3, padding=1)
        self.gdn = GDN(c)
        self.skip = nn.Conv2d(cin, c, 1, stride=2)

    def forward(self, x):
        out = self.gdn(self.c2(F.leaky_relu(self.c1(x))))
        return out + self.skip(x)


class Subpel(nn.Module):
    def __init__(self, cin, c, r=2):
        super().__init__()
        self.conv = nn.Conv2d(cin, c * r * r, 3, padding=1)
        self.r = r

    def forward(self, x):
        return F.pixel_shuffle(self.conv(x), self.r)


class ResBlockUp(nn.Module):
    def __init__(self, cin, c):
        super().__init__()
        self.up = Subpel(cin, c)
        self.conv = nn.Conv2d(c, c, 3, padding=1)
        self.igdn = GDN(c, inverse=True)
        self.skip = Subpel(cin, c)

    def forward(self, x):
        out = self.igdn(self.conv(F.leaky_relu(self.up(x))))
        return out + self.skip(x)


class Hyperprior(nn.Module):
    def __init__(self, ch, N=128):
        super().__init__()
        ga = []
        cin = ch
        for _ in range(3):
            ga += [ResBlockStride(cin, N), ResBlock(N, N)]
            cin = N
        ga += [nn.Conv2d(N, N, 3, stride=2, padding=1)]
        self.g_a = nn.Sequential(*ga)
        ha = []
        for s in (1, 1, 2, 1, 2):
            ha += [nn.Conv2d(N, N, 3, stride=s, padding=1), nn.LeakyReLU()]
        self.h_a = nn.Sequential(*ha[:-1])
        self.h_s = nn.Sequential(
            nn.Conv2d(N, N, 3, padding=1), nn.LeakyReLU(),
            Subpel(N, N), nn.LeakyReLU(),
            nn.Conv2d(N, N * 3 // 2, 3, padding=1), nn.LeakyReLU(),
            Subpel(N * 3 // 2, N * 3 // 2), nn.LeakyReLU(),
            nn.Conv2d(N * 3 // 2, N * 2, 3, padding=1),
        )
        gs = []
        for _ in range(3):
            gs += [ResBlock(N, N), ResBlockUp(N, N)]
        gs += [ResBlock(N, N), Subpel(N, ch)]
        self.g_s = nn.Sequential(*gs)

    def forward(self, x):
        y = self.g_a(x)
        z = self.h_a(y)
        z_hat = torch.round(z)
        params = self.h_s(z_hat)
        scales, means = params.chunk(2, dim=1)
        y_hat = torch.round(y - means) + means
        bits = gaussian_bits(y, scales, means) + gaussian_bits(
            z, torch.ones_like(z), torch.zeros_like(z)
        )
        return self.g_s(y_hat), bits


def gaussian_bits(y, scales, means):
    scales = torch.clamp(torch.abs(scales), min=0.11)
    v = torch.round(y - means)
    up = 0.5 * torch.special.erfc(-(v + 0.5) / (scales * math.sqrt(2)))
    lo = 0.5 * torch.special.erfc(-(v - 0.5) / (scales * math.sqrt(2)))
    lik = torch.clamp(up - lo, min=2.0**-16)
    return -torch.log2(lik).sum()


class MaskUNet(nn.Module):
    def __init__(self, ch=32):
        super().__init__()
        self.d1 = nn.Conv2d(6, ch, 5, padding=2)
        self.d2 = nn.Conv2d(ch, ch * 2, 5, padding=2)
        self.d3 = nn.Conv2d(ch * 2, ch * 4, 3, padding=1)
        self.mid = nn.Conv2d(ch * 4, ch * 4, 3, padding=1)
        self.u3 = nn.Conv2d(ch * 8, ch * 4, 3, padding=1)
        self.u2 = nn.Conv2d(ch * 6, ch * 2, 5, padding=2)
        self.u1 = nn.Conv2d(ch * 3, ch, 5, padding=2)
        self.out = nn.Conv2d(ch, 1, 5, padding=2)

    def forward(self, x):
        c1 = F.relu(self.d1(x))
        c2 = F.relu(self.d2(F.max_pool2d(c1, 2)))
        c3 = F.relu(self.d3(F.max_pool2d(c2, 2)))
        x = F.relu(self.mid(F.max_pool2d(c3, 2)))
        x = F.relu(self.u3(torch.cat([_up2(x), c3], 1)))
        x = F.relu(self.u2(torch.cat([_up2(x), c2], 1)))
        x = F.relu(self.u1(torch.cat([_up2(x), c1], 1)))
        return torch.sigmoid(self.out(x))


def _up2(x):
    return F.interpolate(x, scale_factor=2, mode="bilinear")


class LHBDCTorch(nn.Module):
    def __init__(self, N=128):
        super().__init__()
        self.flownet = SPyNet()
        self.mv = Hyperprior(4, N)
        self.res = Hyperprior(3, N)
        self.mask = MaskUNet()

    def forward(self, x_before, x_cur, x_after):
        f_ba = self.flownet(x_before, x_after)
        f_ab = self.flownet(x_after, x_before)
        f_cb = self.flownet(x_cur, x_before)
        f_ca = self.flownet(x_cur, x_after)
        p_ba = F.avg_pool2d(f_ba / 2, 4)
        p_ab = F.avg_pool2d(f_ab / 2, 4)
        c_cb = F.avg_pool2d(f_cb, 4)
        c_ca = F.avg_pool2d(f_ca, 4)
        diff = torch.cat([c_cb - p_ba, c_ca - p_ab], dim=1)
        diff = _pad64(diff)
        dec_flows, mv_bits = self.mv(diff)
        dec_flows = dec_flows[..., : c_cb.shape[-2], : c_cb.shape[-1]]
        r_cb = (dec_flows[:, :2] + p_ba) * 4
        r_ca = (dec_flows[:, 2:] + p_ab) * 4
        r_cb = F.interpolate(r_cb, scale_factor=4, mode="bilinear")
        r_ca = F.interpolate(r_ca, scale_factor=4, mode="bilinear")
        w_b = warp(x_before, r_cb)
        w_a = warp(x_after, r_ca)
        m = self.mask(torch.cat([w_b, w_a], 1))
        pred = m * w_b + (1 - m) * w_a
        recon, res_bits = self.res(x_cur - pred)
        return pred + recon, mv_bits + res_bits


def _pad64(x):
    h, w = x.shape[-2:]
    ph, pw = (-h) % 64, (-w) % 64
    return F.pad(x, (0, pw, 0, ph), mode="replicate") if ph or pw else x


def main():
    torch.manual_seed(0)
    h, w = 1088, 1920
    model = LHBDCTorch().eval()
    xb = torch.rand(1, 3, h, w)
    xc = torch.rand(1, 3, h, w)
    xa = torch.rand(1, 3, h, w)
    with torch.no_grad():
        # warm allocator/kernels at small size first
        s = torch.rand(1, 3, 256, 256)
        model(s, s, s)
        t0 = time.perf_counter()
        _, bits = model(xb, xc, xa)
        dt = time.perf_counter() - t0
        assert torch.isfinite(bits)
    print(
        json.dumps(
            {
                "torch_cpu_fps": round(1.0 / dt, 4),
                "seconds_per_frame": round(dt, 2),
                "threads": torch.get_num_threads(),
                "resolution": f"{h}x{w}",
            }
        )
    )


if __name__ == "__main__":
    main()
