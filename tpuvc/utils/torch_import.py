"""Import reference (PyTorch/compressai) checkpoints into tpuvc parameter trees.

A user of the reference repo has trained ``.pth`` checkpoints; this module
lets them bring those weights to the TPU framework. It maps the reference's
state-dict key space onto tpuvc's flax parameter tree and converts tensor
layouts (OIHW conv kernels -> HWIO; everything NHWC downstream).

Supported today: the LHBDC B-frame model (M1-M6) — the reference's
checkpoint format is the whole-model ``{"state_dict": sd}`` written by
/root/reference/LHBDC/train.py:205-215 with module names from
LHBDC/model/m.py:20-29 (FlowNet, mv_compressor, residual_compressor,
masknet), compressai layer internals (conv1/conv2/gdn/skip inside residual
blocks, subpel_conv/upsample in upsample blocks, _matrices/_biases/_factors/
quantiles in the entropy bottleneck), and SPyNet's
``netBasic.{level}.netBasic.{2k}`` conv stack (LHBDC/model/flow.py:48-72).

Layout conversions:
  - ``nn.Conv2d`` weight (O, I, kH, kW) -> flax HWIO (kH, kW, I, O).
  - subpel convs keep torch's (C, r, r) output-channel order — tpuvc's
    ``pixel_shuffle`` uses the same convention (tpuvc/ops/resample.py).
  - GDN beta/gamma copy verbatim: both sides store sqrt-domain reparam
    values with the same pedestal (2^-18) and bound; gamma is (out, in) in
    both (torch applies it as a 1x1 conv, tpuvc as an einsum).
  - EntropyBottleneck ``_matrices.{i}`` etc. copy verbatim; the quantized
    CDF buffers are dropped (rebuilt by ``FactorizedTables`` / update()).

Entries that cannot be mapped are reported, never silently dropped.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


class ImportReport:
    """What was consumed and what wasn't."""

    def __init__(self):
        self.used: set[str] = set()
        self.skipped: list[str] = []   # known non-parameters (CDF buffers...)
        self.missing: list[str] = []   # tpuvc slots with no source key

    def unused(self, sd: Mapping[str, Any]) -> list[str]:
        return sorted(k for k in sd if k not in self.used and k not in self.skipped)


def _np(t) -> np.ndarray:
    """torch.Tensor | np.ndarray -> np.ndarray (no torch import required)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


# Buffers rebuilt on the tpuvc side; dropping them is correct, not lossy.
_SKIP_SUFFIXES = (
    "_offset",
    "_quantized_cdf",
    "_cdf_length",
    "target",
    "scale_table",
)


def _conv(sd, rep: ImportReport, tkey: str) -> dict:
    w = sd[f"{tkey}.weight"]
    rep.used.add(f"{tkey}.weight")
    out = {"kernel": _np(w).transpose(2, 3, 1, 0)}
    bkey = f"{tkey}.bias"
    if bkey in sd:
        rep.used.add(bkey)
        out["bias"] = _np(sd[bkey])
    else:
        out["bias"] = np.zeros(out["kernel"].shape[-1], np.float32)
    return out


def _gdn(sd, rep: ImportReport, tkey: str) -> dict:
    rep.used.add(f"{tkey}.beta")
    rep.used.add(f"{tkey}.gamma")
    return {
        "beta": _np(sd[f"{tkey}.beta"]),
        "gamma": _np(sd[f"{tkey}.gamma"]).reshape(
            sd[f"{tkey}.beta"].shape[0], -1
        ),
    }


def _res_block(sd, rep, tkey: str, has_skip: bool) -> dict:
    out = {
        "Conv_0": _conv(sd, rep, f"{tkey}.conv1"),
        "Conv_1": _conv(sd, rep, f"{tkey}.conv2"),
    }
    if has_skip:
        out["Conv_2"] = _conv(sd, rep, f"{tkey}.skip")
    return out


def _res_block_stride(sd, rep, tkey: str) -> dict:
    return {
        "Conv_0": _conv(sd, rep, f"{tkey}.conv1"),
        "Conv_1": _conv(sd, rep, f"{tkey}.conv2"),
        "GDN_0": _gdn(sd, rep, f"{tkey}.gdn"),
        "Conv_2": _conv(sd, rep, f"{tkey}.skip"),
    }


def _res_block_upsample(sd, rep, tkey: str) -> dict:
    return {
        "SubpelConv_0": {"Conv_0": _conv(sd, rep, f"{tkey}.subpel_conv.0")},
        "Conv_0": _conv(sd, rep, f"{tkey}.conv"),
        "GDN_0": _gdn(sd, rep, f"{tkey}.igdn"),
        "SubpelConv_1": {"Conv_0": _conv(sd, rep, f"{tkey}.upsample.0")},
    }


def _entropy_bottleneck(sd, rep, tkey: str, filters=(3, 3, 3, 3)) -> dict:
    out = {}
    k = len(filters) + 1
    for i in range(k):
        out[f"matrix_{i}"] = _np(sd[f"{tkey}._matrices.{i}"])
        out[f"bias_{i}"] = _np(sd[f"{tkey}._biases.{i}"])
        rep.used.add(f"{tkey}._matrices.{i}")
        rep.used.add(f"{tkey}._biases.{i}")
        if i < k - 1:
            out[f"factor_{i}"] = _np(sd[f"{tkey}._factors.{i}"])
            rep.used.add(f"{tkey}._factors.{i}")
    out["quantiles"] = _np(sd[f"{tkey}.quantiles"])
    rep.used.add(f"{tkey}.quantiles")
    return out


def _hyperprior(sd, rep, tkey: str, in_subpel_sizes=True) -> dict:
    """MVCompressor / ResidualCompressor (LHBDC/model/layers.py:43-191)."""
    out: dict[str, Any] = {}
    # g_a: (RBS, RB) x3 + conv3x3/s2 — torch Sequential indices 0..6
    for i in range(3):
        out[f"g_a_layers_{2 * i}"] = _res_block_stride(sd, rep, f"{tkey}.g_a.{2 * i}")
        has_skip = f"{tkey}.g_a.{2 * i + 1}.skip.weight" in sd
        out[f"g_a_layers_{2 * i + 1}"] = _res_block(
            sd, rep, f"{tkey}.g_a.{2 * i + 1}", has_skip
        )
    out["g_a_layers_6"] = _conv(sd, rep, f"{tkey}.g_a.6")
    # h_a: convs at Sequential indices 0,2,4,6,8 (LeakyReLU between)
    for j, idx in enumerate((0, 2, 4, 6, 8)):
        out[f"h_a_convs_{j}"] = _conv(sd, rep, f"{tkey}.h_a.{idx}")
    # h_s: conv / subpel / conv / subpel / conv at 0, 2.0, 4, 6.0, 8
    out["h_s_conv0"] = _conv(sd, rep, f"{tkey}.h_s.0")
    out["h_s_up0"] = {"Conv_0": _conv(sd, rep, f"{tkey}.h_s.2.0")}
    out["h_s_conv1"] = _conv(sd, rep, f"{tkey}.h_s.4")
    out["h_s_up1"] = {"Conv_0": _conv(sd, rep, f"{tkey}.h_s.6.0")}
    out["h_s_out"] = _conv(sd, rep, f"{tkey}.h_s.8")
    # g_s: (RB, RBUp) x3 + RB + subpel — indices 0..7
    for i in range(3):
        has_skip = f"{tkey}.g_s.{2 * i}.skip.weight" in sd
        out[f"g_s_layers_{2 * i}"] = _res_block(sd, rep, f"{tkey}.g_s.{2 * i}", has_skip)
        out[f"g_s_layers_{2 * i + 1}"] = _res_block_upsample(
            sd, rep, f"{tkey}.g_s.{2 * i + 1}"
        )
    has_skip = f"{tkey}.g_s.6.skip.weight" in sd
    out["g_s_layers_6"] = _res_block(sd, rep, f"{tkey}.g_s.6", has_skip)
    out["g_s_layers_7"] = {"Conv_0": _conv(sd, rep, f"{tkey}.g_s.7.0")}
    out["entropy_bottleneck"] = _entropy_bottleneck(sd, rep, f"{tkey}.entropy_bottleneck")
    return out


def _spynet(sd, rep, tkey: str, num_levels: int = 6) -> dict:
    out = {}
    for lv in range(num_levels):
        blk = {}
        for k, idx in enumerate((0, 2, 4, 6, 8)):
            c = _conv(sd, rep, f"{tkey}.netBasic.{lv}.netBasic.{idx}")
            blk[f"conv{k}_kernel"] = c["kernel"]
            blk[f"conv{k}_bias"] = c["bias"]
        out[f"basic_{lv}"] = blk
    return out


def _mask_unet(sd, rep, tkey: str) -> dict:
    order = (
        "conv1", "conv2", "conv3", "bottleneck",
        "deconv1", "deconv2", "deconv3", "conv4",
    )
    return {
        f"Conv_{i}": _conv(sd, rep, f"{tkey}.{name}")
        for i, name in enumerate(order)
    }


def import_lhbdc_state_dict(sd: Mapping[str, Any]):
    """Reference LHBDC whole-model state dict -> (flax params, ImportReport).

    Accepts either the raw ``model.state_dict()`` mapping or the
    ``{"state_dict": ...}`` wrapper the reference trainer writes.
    """
    if "state_dict" in sd and not hasattr(sd["state_dict"], "shape"):
        sd = sd["state_dict"]
    rep = ImportReport()
    for k in sd:
        if k.endswith(_SKIP_SUFFIXES):
            rep.skipped.append(k)
    params = {
        "flownet": _spynet(sd, rep, "FlowNet"),
        "mv_compressor": _hyperprior(sd, rep, "mv_compressor"),
        "residual_compressor": _hyperprior(sd, rep, "residual_compressor"),
        "masknet": _mask_unet(sd, rep, "masknet"),
    }
    return params, rep


def _unet(sd, rep, tkey: str, depth: int) -> dict:
    """Flex-Rate UNet (Flex-Rate.../b_model/unet.py:9-95) -> tpuvc UNet.

    tpuvc's @nn.compact call order numbers the convs: down blocks (2 per
    level), midconv, up blocks (up conv + 2 block convs, processed from the
    deepest = torch up_path.0), final conv.
    """
    out = {}
    c = 0

    def put(src):
        nonlocal c
        out[f"Conv_{c}"] = _conv(sd, rep, src)
        c += 1

    for i in range(depth):
        put(f"{tkey}.down_path.{i}.block.0")
        put(f"{tkey}.down_path.{i}.block.2")
    put(f"{tkey}.midconv")
    for j in range(depth - 1):
        put(f"{tkey}.up_path.{j}.up.1")
        put(f"{tkey}.up_path.{j}.conv_block.block.0")
        put(f"{tkey}.up_path.{j}.conv_block.block.2")
    put(f"{tkey}.last")
    return out


def _gain(sd, rep, tkey: str) -> dict:
    rep.used.add(f"{tkey}.gain_matrix")
    return {"gain_matrix": _np(sd[f"{tkey}.gain_matrix"])}


def import_flexrate_state_dict(sd: Mapping[str, Any]):
    """Reference Flex-Rate BidirFlowRef state dict -> (flax params, report).

    Module names from Flex-Rate.../b_model/b_model.py:28-32 (flow_predictor,
    Mask, flow_compressor, residual_compressor); the gained compressors share
    the LHBDC hyperprior transform topology plus 4 gain units each
    (b_model/layers.py:76-246).
    """
    if "state_dict" in sd and not hasattr(sd["state_dict"], "shape"):
        sd = sd["state_dict"]
    rep = ImportReport()
    for k in sd:
        if k.endswith(_SKIP_SUFFIXES):
            rep.skipped.append(k)

    def gained(tkey):
        out = _hyperprior(sd, rep, tkey)
        for g in ("gain_unit", "inv_gain_unit",
                  "hyper_gain_unit", "hyper_inv_gain_unit"):
            out[g] = _gain(sd, rep, f"{tkey}.{g}")
        return out

    params = {
        "flow_predictor": _unet(sd, rep, "flow_predictor", depth=5),
        "mask": _unet(sd, rep, "Mask", depth=4),
        "flow_compressor": gained("flow_compressor"),
        "residual_compressor": gained("residual_compressor"),
    }
    return params, rep


_IMPORTERS = {
    "lhbdc": import_lhbdc_state_dict,
    "flexrate": import_flexrate_state_dict,
}


def load_pth(path: str, family: str = "lhbdc"):
    """Load a reference ``.pth`` via torch (CPU) and convert.
    Returns (params, report)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    return _IMPORTERS[family](sd)


def load_lhbdc_pth(path: str):
    """Load a reference ``compression_{lambda}.pth`` via torch (CPU) and
    convert. Returns (params, report)."""
    return load_pth(path, "lhbdc")
