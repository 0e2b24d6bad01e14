"""Naive pure-torch deform_conv2d with torchvision's exact semantics:
offset layout (B, 2*off_grps*kH*kW, Ho, Wo) ordered (dy, dx) per tap,
modulation mask multiplied after bilinear sampling, zero padding outside
the input, weight groups Cin/Cg. Slow (per-tap python loop) but it is an
ORACLE, not a production kernel."""

import torch
import torch.nn as nn


def _bilinear_zero(x, py, px):
    """x: (B, G, C, H, W); py/px: (B, G, Ho, Wo) absolute sample coords.
    -> (B, G, C, Ho, Wo), zero outside [0, H-1] x [0, W-1]."""
    B, G, C, H, W = x.shape
    y0 = torch.floor(py)
    x0 = torch.floor(px)
    wy1 = py - y0
    wx1 = px - x0
    out = None
    for dy, wy in ((0, 1 - wy1), (1, wy1)):
        for dx, wx in ((0, 1 - wx1), (1, wx1)):
            yy = y0 + dy
            xx = x0 + dx
            valid = (yy >= 0) & (yy <= H - 1) & (xx >= 0) & (xx <= W - 1)
            yc = yy.clamp(0, H - 1).long()
            xc = xx.clamp(0, W - 1).long()
            # gather: flatten spatial
            flat = x.reshape(B, G, C, H * W)
            idx = (yc * W + xc).reshape(B, G, 1, -1).expand(B, G, C, -1)
            v = torch.gather(flat, 3, idx).reshape(B, G, C, *py.shape[2:])
            w = (wy * wx * valid.to(x.dtype)).unsqueeze(2)
            out = v * w if out is None else out + v * w
    return out


def deform_conv2d(input, offset, weight, bias=None, stride=(1, 1),
                  padding=(0, 0), dilation=(1, 1), mask=None):
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    B, Cin, H, W = input.shape
    Cout, Cg, kH, kW = weight.shape
    n_w_grps = Cin // Cg
    sh, sw = stride
    ph, pw = padding
    dh, dw = dilation
    Ho = (H + 2 * ph - (dh * (kH - 1) + 1)) // sh + 1
    Wo = (W + 2 * pw - (dw * (kW - 1) + 1)) // sw + 1
    n_off_grps = offset.shape[1] // (2 * kH * kW)

    off = offset.reshape(B, n_off_grps, kH * kW, 2, Ho, Wo)
    msk = (
        mask.reshape(B, n_off_grps, kH * kW, Ho, Wo)
        if mask is not None else None
    )
    ys = torch.arange(Ho, device=input.device, dtype=input.dtype) * sh - ph
    xs = torch.arange(Wo, device=input.device, dtype=input.dtype) * sw - pw
    xg = input.reshape(B, n_off_grps, Cin // n_off_grps, H, W)

    cols = []
    for k in range(kH * kW):
        kh, kw = k // kW, k % kW
        py = ys.view(1, 1, -1, 1) + kh * dh + off[:, :, k, 0]
        px = xs.view(1, 1, 1, -1) + kw * dw + off[:, :, k, 1]
        v = _bilinear_zero(xg, py, px)
        if msk is not None:
            v = v * msk[:, :, k].unsqueeze(2)
        cols.append(v.reshape(B, Cin, Ho, Wo))
    # (B, n_w_grps, Cg, K, Ho, Wo) x (n_w_grps, Co/g, Cg, K)
    col = torch.stack(cols, dim=2).reshape(B, n_w_grps, Cg, kH * kW, Ho, Wo)
    w = weight.reshape(n_w_grps, Cout // n_w_grps, Cg, kH * kW)
    out = torch.einsum("bgckyx,gock->bgoyx", col, w)
    out = out.reshape(B, Cout, Ho, Wo)
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


class DeformConv2d(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias=True):
        super().__init__()
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size, kernel_size)
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.groups = groups
        self.weight = nn.Parameter(
            torch.empty(out_channels, in_channels // groups, *kernel_size)
        )
        self.bias = nn.Parameter(torch.empty(out_channels)) if bias else None
        nn.init.kaiming_uniform_(self.weight, a=5 ** 0.5)
        if self.bias is not None:
            fan_in = in_channels // groups * kernel_size[0] * kernel_size[1]
            bound = 1 / fan_in ** 0.5
            nn.init.uniform_(self.bias, -bound, bound)

    def forward(self, input, offset, mask=None):
        return deform_conv2d(
            input, offset, self.weight, self.bias, self.stride,
            self.padding, self.dilation, mask,
        )
