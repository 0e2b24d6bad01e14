"""Stage-by-stage numerical parity: the reference's own PyTorch code vs
tpuvc, through tpuvc.utils.torch_import (VERDICT r3 task #1).

The reference model code under /root/reference is EXECUTED (via the
tests/refshim compressai/torchvision shims) as a numerical oracle with
random-init weights; the identical ``state_dict`` is converted by the
importer and the tpuvc forward must agree stage by stage. This is the
strongest RD-parity evidence obtainable on a machine with no datasets or
trained checkpoints: it proves the transforms, the entropy math (bits),
and the importer's layout conversions all match the reference
implementation, leaving only trained-weight RD measurements open
(scripts/validate_rd.sh runs those when weights/frames land).

Shared by tests/test_reference_parity.py (assertions) and
scripts/gen_parity.py (the PARITY.md max-abs-diff table).

Reference call sites exercised:
  LHBDC   /root/reference/LHBDC/model/m.py:32-98 (+flow.py, layers.py)
  FlexRate /root/reference/Flex-Rate…/b_model/b_model.py:49-98 (+layers.py)
  v3 blocks ICIP2023/src/model/m.py + offset_res_elic.py
  v4 blocks ICIP2024/src/model/m.py + compression_bottlenecks.py
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "refshim"))


def _nhwc(t):
    return np.ascontiguousarray(
        t.detach().cpu().numpy().transpose(0, 2, 3, 1)
    )


def _nchw_torch(a):
    import torch

    return torch.from_numpy(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))


def _frames_np(shape=(1, 192, 256, 3), seed=7, drift=0.04):
    rng = np.random.default_rng(seed)
    base = rng.random(shape, dtype=np.float32)
    d = (drift * rng.standard_normal(shape)).astype(np.float32)
    x1 = base
    xc = np.clip(base + 0.5 * d, 0, 1)
    x2 = np.clip(base + d, 0, 1)
    return x1, xc, x2


class StageTable:
    """stage -> {max_abs, ref_scale, rel} rows, printable as markdown."""

    def __init__(self, family: str):
        self.family = family
        self.rows: dict[str, dict] = {}

    def add(self, stage, ref, got):
        ref = np.asarray(ref, np.float64)
        got = np.asarray(got, np.float64)
        assert ref.shape == got.shape, (stage, ref.shape, got.shape)
        max_abs = float(np.max(np.abs(ref - got))) if ref.size else 0.0
        scale = float(np.max(np.abs(ref))) if ref.size else 0.0
        self.rows[stage] = {
            "max_abs": max_abs,
            "ref_scale": scale,
            "rel": max_abs / max(scale, 1e-12),
        }

    def markdown(self):
        out = [
            f"### {self.family}",
            "",
            "| stage | max abs diff | ref scale | rel |",
            "|---|---|---|---|",
        ]
        for k, r in self.rows.items():
            out.append(
                f"| {k} | {r['max_abs']:.3e} | {r['ref_scale']:.3e} "
                f"| {r['rel']:.2e} |"
            )
        return "\n".join(out) + "\n"


def _bits(likelihood_dict):
    import torch

    return float(
        sum(
            torch.log(l).sum() / (-math.log(2))
            for l in likelihood_dict.values()
        )
    )


def lhbdc_parity(hw=(192, 256), N=128) -> StageTable:
    import torch

    from refload import lhbdc_model

    from tpuvc.utils.torch_import import import_lhbdc_state_dict

    torch.manual_seed(7)
    Model = lhbdc_model()
    ref = Model().eval()

    captures = {"flows": []}

    def _hook(name):
        def f(mod, args, out):
            if name == "flows":
                captures["flows"].append(out)
            else:
                captures[name] = out
        return f

    ref.FlowNet.register_forward_hook(_hook("flows"))
    ref.mv_compressor.register_forward_hook(_hook("mv"))
    ref.residual_compressor.register_forward_hook(_hook("res"))

    x1n, xcn, x2n = _frames_np((1,) + tuple(hw) + (3,))
    with torch.no_grad():
        x_hat_t, rate_t, size_t = ref(
            _nchw_torch(x1n), _nchw_torch(xcn), _nchw_torch(x2n), train=False
        )

    sd = ref.state_dict()
    params, rep = import_lhbdc_state_dict(sd)
    unmapped = rep.unused(sd)
    assert not unmapped, f"importer left reference keys unused: {unmapped[:8]}"

    import jax
    import jax.numpy as jnp

    from tpuvc.models.lhbdc import LHBDC

    model = LHBDC(N=N)
    variables = {"params": params}
    xb, xc, xa = (jnp.asarray(a) for a in (x1n, xcn, x2n))
    out = jax.jit(
        lambda v, a, b, c: model.apply(v, a, b, c, "dequantize")
    )(variables, xb, xc, xa)

    flows_j = model.apply(
        variables,
        [xb, xa, xc, xc],
        [xa, xb, xb, xa],
        method=lambda m, a, b: m._batched_flows(a, b),
    )

    t = StageTable("lhbdc")
    # The reference calls FlowNet in order ba, ab, cb, ca (m.py:38-47).
    for name, ref_f, got_f in zip(
        ("flow_ba", "flow_ab", "flow_cb", "flow_ca"),
        captures["flows"], flows_j,
    ):
        t.add(name, _nhwc(ref_f), np.asarray(got_f))
    t.add("bits_flow", [_bits(captures["mv"]["likelihoods"])],
          [float(out["bits_flow"])])
    t.add("bits_residual", [_bits(captures["res"]["likelihoods"])],
          [float(out["bits_residual"])])
    x_pred_ref = x_hat_t - captures["res"]["x_hat"]
    t.add("x_pred", _nhwc(x_pred_ref), np.asarray(out["x_pred"]))
    t.add("x_hat", _nhwc(x_hat_t), np.asarray(out["x_hat"]))
    t.add("rate", [float(rate_t)], [float(out["rate"])])
    t.add("size", [float(size_t)], [float(out["bits"])])
    return t


def flexrate_parity(hw=(192, 256), N=128, n=2, l=1.0) -> StageTable:
    import torch

    from refload import flexrate_model

    from tpuvc.utils.torch_import import import_flexrate_state_dict

    bm = flexrate_model()
    torch.manual_seed(8)
    ref = bm.BidirFlowRef(n=6, N=N).eval()
    # Gain matrices init to ones (a no-op); randomize them so the
    # fractional-level geometric interpolation path is actually exercised.
    with torch.no_grad():
        for comp in (ref.flow_compressor, ref.residual_compressor):
            for gu in (comp.gain_unit, comp.inv_gain_unit,
                       comp.hyper_gain_unit, comp.hyper_inv_gain_unit):
                gu.gain_matrix.normal_(1.0, 0.2)

    captures = {}

    def _hook(name):
        def f(mod, args, out):
            captures[name] = out
        return f

    ref.flow_predictor.register_forward_hook(_hook("flow_pred"))
    ref.flow_compressor.register_forward_hook(_hook("flow"))
    ref.residual_compressor.register_forward_hook(_hook("res"))

    x1n, xcn, x2n = _frames_np((1,) + tuple(hw) + (3,), seed=8)
    with torch.no_grad():
        out_t = ref(
            _nchw_torch(x1n), _nchw_torch(xcn), _nchw_torch(x2n),
            n=[n], l=l, train=False,
        )

    sd = ref.state_dict()
    params, rep = import_flexrate_state_dict(sd)
    unmapped = rep.unused(sd)
    assert not unmapped, f"importer left reference keys unused: {unmapped[:8]}"

    import jax
    import jax.numpy as jnp

    from tpuvc.models.flexrate import BidirFlowRef

    model = BidirFlowRef(N=N)
    variables = {"params": params}
    xb, xc, xa = (jnp.asarray(a) for a in (x1n, xcn, x2n))
    out = jax.jit(
        lambda v, a, b, c: model.apply(v, a, b, c, n, l, "dequantize")
    )(variables, xb, xc, xa)

    t = StageTable("flexrate")
    t.add("flow_pred", _nhwc(captures["flow_pred"]),
          np.asarray(model.apply(
              variables, jnp.concatenate([xb, xa], axis=-1),
              method=lambda m, x: m.flow_predictor(x),
          )))
    x_comp_ref = out_t["x_hat"] - captures["res"]["x_hat"]
    t.add("x_comp", _nhwc(x_comp_ref), np.asarray(out["x_comp"]))
    t.add("x_hat", _nhwc(out_t["x_hat"]), np.asarray(out["x_hat"]))
    t.add("size", [float(out_t["size"].sum())],
          [float(np.asarray(out["size"]).sum())])
    t.add("rate", [float(out_t["rate"].sum())],
          [float(np.asarray(out["rate"]).sum())])
    return t


def deform_b_parity(hw=(128, 128), s=1.0) -> StageTable:
    """v3 DeformB: reference ICIP2023/src/model/m.py:19-139 executed vs
    tpuvc models/deform_b.py (incl. the naive torchvision deform_conv2d
    oracle vs tpuvc's deform_conv2d)."""
    import torch

    from refload import icip2023_model

    from tpuvc.utils.torch_import import import_deform_b_state_dict

    m = icip2023_model()
    torch.manual_seed(9)
    ref = m.DeformB().eval()

    captures = {}

    def _hook(name):
        def f(mod, args, out):
            captures[name] = out
        return f

    ref.offset_compressor.register_forward_hook(_hook("offset"))
    ref.residual_compressor.register_forward_hook(_hook("res"))

    x1n, xcn, x2n = _frames_np((1,) + tuple(hw) + (3,), seed=9)
    with torch.no_grad():
        out_t = ref(
            _nchw_torch(x1n), _nchw_torch(x2n), _nchw_torch(xcn), s
        )

    sd = ref.state_dict()
    params, rep = import_deform_b_state_dict(sd)
    unmapped = rep.unused(sd)
    assert not unmapped, f"importer left reference keys unused: {unmapped[:8]}"

    import jax
    import jax.numpy as jnp

    from tpuvc.entropy.emath import likelihood_to_bits
    from tpuvc.models.deform_b import DeformB

    model = DeformB()
    variables = {"params": params}
    xb, xc, xa = (jnp.asarray(a) for a in (x1n, xcn, x2n))
    out = jax.jit(
        lambda v, a, b, c: model.apply(v, a, b, c, float(s), "dequantize")
    )(variables, xb, xa, xc)

    t = StageTable("deform_b")
    t.add("x_hat", _nhwc(out_t["x_hat"]), np.asarray(out["x_hat"]))
    t.add("size", [float(out_t["size"])],
          [float(np.asarray(out["size"]).sum())])
    t.add("rate", [float(out_t["rate"])],
          [float(np.asarray(out["rate"]).sum())])
    return t


def flowguided_parity(hw=(128, 128), s=1.0, scale1=0.5, scale2=-0.5,
                      down_ratio=1) -> StageTable:
    """v4 FlowGuidedB: reference ICIP2024/src/model/m.py:31-283 executed vs
    tpuvc models/flowguided_b.py (FlowNET, flow-guided OffsetDiversity
    deformable fusion, conditional ELIC bottlenecks)."""
    import torch

    from refload import icip2024_model

    from tpuvc.utils.torch_import import import_flowguided_state_dict

    m = icip2024_model()
    torch.manual_seed(10)
    ref = m.FlowGuidedB().eval()

    captures = {}

    def _hook(name):
        def f(mod, args, out):
            captures[name] = out
        return f

    ref.flow_estimator.register_forward_hook(_hook("flow"))
    ref.offset_compressor.register_forward_hook(_hook("offset"))
    ref.residual_compressor.register_forward_hook(_hook("res"))

    x1n, xcn, x2n = _frames_np((1,) + tuple(hw) + (3,), seed=10)
    with torch.no_grad():
        out_t = ref(
            _nchw_torch(x1n), _nchw_torch(x2n), scale1, scale2,
            _nchw_torch(xcn), int(s), down_ratio,
        )

    sd = ref.state_dict()
    params, rep = import_flowguided_state_dict(sd)
    unmapped = rep.unused(sd)
    assert not unmapped, f"importer left reference keys unused: {unmapped[:8]}"

    import jax
    import jax.numpy as jnp

    from tpuvc.models.flowguided_b import FlowGuidedB

    model = FlowGuidedB()
    variables = {"params": params}
    xb, xc, xa = (jnp.asarray(a) for a in (x1n, xcn, x2n))
    out = jax.jit(
        lambda v, a, b, c: model.apply(
            v, a, b, c, float(s), scale1, scale2, down_ratio, "dequantize"
        )
    )(variables, xb, xa, xc)

    t = StageTable("flowguided_b")
    flow_j = model.apply(
        variables, xb, xa, down_ratio,
        method=lambda mm, a, b, r: mm.estimate_flow(a, b, r),
    )
    t.add("flow_l1", _nhwc(_ref_flow_l1(m, ref, captures, x1n, x2n,
                                        down_ratio)),
          np.asarray(flow_j))
    t.add("x_hat", _nhwc(out_t["x_hat"]), np.asarray(out["x_hat"]))
    t.add("size", [float(out_t["size"])],
          [float(np.asarray(out["size"]).sum())])
    t.add("rate", [float(out_t["rate"])],
          [float(np.asarray(out["rate"]).sum())])
    return t


def elic_parity(hw=(128, 192), stage2=False) -> StageTable:
    """ELIC intra (the I-frame codec of every GOP): reference
    ICIP2023/src/model/elic.py:87-306 (forward / forward_stage2) executed
    vs tpuvc models/elic.py through the ``--family elic`` importer.
    Covers the uneven-group checkerboard + channel-context entropy chain
    (z bits and all five per-group y bits compared separately)."""
    import torch

    from refload import icip2023_elic

    from tpuvc.utils.torch_import import import_elic_state_dict

    mod = icip2023_elic()
    torch.manual_seed(11)
    ref = mod.ELIC().eval()

    xn, _, _ = _frames_np((1,) + tuple(hw) + (3,), seed=11)
    with torch.no_grad():
        out_t = (
            ref.forward_stage2(_nchw_torch(xn)) if stage2
            else ref(_nchw_torch(xn))
        )

    sd = ref.state_dict()
    params, rep = import_elic_state_dict(sd)
    unmapped = rep.unused(sd)
    assert not unmapped, f"importer left reference keys unused: {unmapped[:8]}"

    import jax
    import jax.numpy as jnp

    from tpuvc.entropy.emath import likelihood_to_bits
    from tpuvc.models.elic import ELIC

    model = ELIC()
    variables = {"params": params}
    out = jax.jit(
        lambda v, x: model.apply(v, x, "dequantize", stage2=stage2)
    )(variables, jnp.asarray(xn))

    t = StageTable("elic" + ("_stage2" if stage2 else ""))
    for k in ("z", "y_0", "y_1", "y_2", "y_3", "y_4"):
        t.add(
            f"bits_{k}",
            [_bits({k: out_t["likelihoods"][k]})],
            [float(likelihood_to_bits(out["likelihoods"][k]))],
        )
    t.add("x_hat", _nhwc(out_t["x_hat"]), np.asarray(out["x_hat"]))
    return t


def _ref_flow_l1(m, ref, captures, x1n, x2n, down_ratio):
    """Recompute the reference's post-processed L1 flow (estimate_flow
    wraps the hooked FlowNET output with pad/crop/scale, m.py:90-105)."""
    import torch

    with torch.no_grad():
        return ref.estimate_flow(
            _nchw_torch(x1n), _nchw_torch(x2n), down_ratio
        )
