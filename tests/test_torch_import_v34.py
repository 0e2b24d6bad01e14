"""Importer coverage for the v3/v4 families and the ELIC intra codec.

Strategy: build synthetic reference state dicts with exactly the key space
and tensor shapes the reference models produce (topology from
ICIP2023/src/model/{elic,offset_res_elic,helpers,m}.py and
ICIP2024/src/model/{compression_bottlenecks,helpers,m}.py), run the
importer, and require the resulting tree to match ``model.init``'s
parameter tree leaf-for-leaf (names and shapes), with every source key
consumed. The Deconv weight transform is additionally validated
numerically against torch's ConvTranspose2d.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvc.utils import torch_import as ti

pytestmark = pytest.mark.slow


def _rnd(rng, shape):
    return rng.standard_normal(shape).astype(np.float32)


def put_conv(sd, rng, key, cin, cout, k):
    sd[f"{key}.weight"] = _rnd(rng, (cout, cin, k, k))
    sd[f"{key}.bias"] = _rnd(rng, (cout,))


def put_deconv(sd, rng, key, cin, cout, k):
    sd[f"{key}.weight"] = _rnd(rng, (cin, cout, k, k))
    sd[f"{key}.bias"] = _rnd(rng, (cout,))


def put_rbb(sd, rng, key, c):
    put_conv(sd, rng, f"{key}.BottleneckBlock.0", c, c, 1)
    put_conv(sd, rng, f"{key}.BottleneckBlock.2", c, c, 3)
    put_conv(sd, rng, f"{key}.BottleneckBlock.4", c, c, 1)


def put_attn(sd, rng, key, c):
    for branch in ("conv_a", "conv_b"):
        for i in range(3):
            put_conv(sd, rng, f"{key}.{branch}.{i}.conv.0", c, c // 2, 1)
            put_conv(sd, rng, f"{key}.{branch}.{i}.conv.2", c // 2, c // 2, 3)
            put_conv(sd, rng, f"{key}.{branch}.{i}.conv.4", c // 2, c, 1)
    put_conv(sd, rng, f"{key}.conv_b.3", c, c, 1)


def put_conv_rbb(sd, rng, key, cin, cout, k=5, blocks=3):
    put_conv(sd, rng, f"{key}.0", cin, cout, k)
    for i in range(blocks):
        put_rbb(sd, rng, f"{key}.{i + 1}", cout)


def put_eb(sd, rng, key, C):
    """compressai EntropyBottleneck(C), default filters (3,3,3,3)."""
    dims = (1, 3, 3, 3, 3, 1)
    for i in range(5):
        sd[f"{key}._matrices.{i}"] = _rnd(rng, (C, dims[i + 1], dims[i]))
        sd[f"{key}._biases.{i}"] = _rnd(rng, (C, dims[i + 1], 1))
        if i < 4:
            sd[f"{key}._factors.{i}"] = _rnd(rng, (C, dims[i + 1], 1))
    sd[f"{key}.quantiles"] = _rnd(rng, (C, 1, 3))
    # registered buffers that must be skipped, not imported
    sd[f"{key}._offset"] = np.zeros((C,), np.float32)
    sd[f"{key}._quantized_cdf"] = np.zeros((C, 8), np.int32)
    sd[f"{key}._cdf_length"] = np.zeros((C,), np.int32)


def put_gaussian_buffers(sd, key):
    sd[f"{key}.scale_table"] = np.zeros((64,), np.float32)
    sd[f"{key}._offset"] = np.zeros((1,), np.float32)
    sd[f"{key}._quantized_cdf"] = np.zeros((1, 8), np.int32)
    sd[f"{key}._cdf_length"] = np.zeros((1,), np.int32)


def put_entropy_head(sd, rng, t, M, groups, N=None):
    """entropy_parameters / channel_context / checkerboard stacks + the dead
    inherited JAHP context_prediction module. ``N`` is the ctx stacks'
    hidden width (the codec's N)."""
    N = M if N is None else N
    for i, g in enumerate(groups):
        cin = M * 4 if i == 0 else M * 6
        put_conv(sd, rng, f"{t}entropy_parameters.{i}.0", cin, M * 10 // 3, 1)
        put_conv(
            sd, rng, f"{t}entropy_parameters.{i}.2", M * 10 // 3, M * 8 // 3, 1
        )
        put_conv(
            sd, rng, f"{t}entropy_parameters.{i}.4", M * 8 // 3, 2 * g, 1
        )
        put_conv(
            sd, rng, f"{t}context_prediction_models.{i}", g, M * 2, 5
        )
        sd[f"{t}context_prediction_models.{i}.mask"] = np.zeros(
            (M * 2, g, 5, 5), np.float32
        )
    prev = 0
    for i, g in enumerate(groups[:-1]):
        prev += g
        put_conv(sd, rng, f"{t}channel_context_models.{i}.0", prev, N, 5)
        put_conv(sd, rng, f"{t}channel_context_models.{i}.2", N, N, 5)
        put_conv(sd, rng, f"{t}channel_context_models.{i}.4", N, M * 2, 5)
    # dead JointAutoregressiveHierarchicalPriors context_prediction module
    # (inherited, never called by ELIC/Offset_ELIC/Res_ELIC forwards)
    sd[f"{t}context_prediction.weight"] = _rnd(rng, (2 * M, M, 5, 5))
    sd[f"{t}context_prediction.bias"] = _rnd(rng, (2 * M,))
    sd[f"{t}context_prediction.mask"] = np.zeros((2 * M, M, 5, 5), np.float32)


def cond_elic_sd(sd, rng, t, in_ch, cond_ch, head_ch, N=128, M=128,
                 pixel=False):
    """Offset_ELIC / Res_ELIC key space (offset_res_elic.py:72-461)."""
    groups = (6, 6, 12, 24, M - 48)
    if pixel:
        put_conv_rbb(sd, rng, f"{t}.g_a0", 3, N, 5)
        put_conv_rbb(sd, rng, f"{t}.g_a1", N + in_ch[0], N, 5)
    else:
        put_conv_rbb(sd, rng, f"{t}.g_a1", in_ch[0], N, 5)
    put_conv_rbb(sd, rng, f"{t}.g_a2", N + in_ch[1], N, 5)
    put_conv_rbb(sd, rng, f"{t}.g_a3", N + in_ch[2], M, 5)
    for i in range(3):
        put_rbb(sd, rng, f"{t}.g_s3.{i}", M)
    put_deconv(sd, rng, f"{t}.g_s3.3", M, N, 5)
    for lv in (1, 2, 3):
        put_conv(sd, rng, f"{t}.g_o{lv}.0", N + cond_ch[lv - 1], N, 3)
        for i in range(3):
            put_rbb(sd, rng, f"{t}.g_o{lv}.{i + 1}", N)
        put_conv(sd, rng, f"{t}.g_o{lv}.4", N, head_ch[lv - 1], 3)
    for lv in (1, 2):
        put_conv(sd, rng, f"{t}.g_s{lv}.0", N + cond_ch[lv], N, 1)
        for i in range(3):
            put_rbb(sd, rng, f"{t}.g_s{lv}.{i + 1}", N)
        put_deconv(sd, rng, f"{t}.g_s{lv}.4", N, N, 5)
    put_conv(sd, rng, f"{t}.h_a.0", M, N, 3)
    put_conv(sd, rng, f"{t}.h_a.2", N, N, 5)
    put_conv(sd, rng, f"{t}.h_a.4", N, N, 5)
    put_deconv(sd, rng, f"{t}.h_s.0", N, M, 5)
    put_deconv(sd, rng, f"{t}.h_s.2", M, M, 5)
    put_conv(sd, rng, f"{t}.h_s.4", M, M, 3)
    put_conv(sd, rng, f"{t}.prior_fusion.0", 2 * M, 2 * M, 3)
    for i in range(3):
        put_rbb(sd, rng, f"{t}.prior_fusion.{i + 1}", 2 * M)
    put_conv(sd, rng, f"{t}.prior_fusion.4", 2 * M, 2 * M, 3)
    put_entropy_head(sd, rng, f"{t}.", M, groups)
    for g, width in (
        ("Gain", M), ("InverseGain", M), ("HyperGain", N),
        ("InverseHyperGain", N),
    ):
        sd[f"{t}.{g}"] = _rnd(rng, (5, width))
    put_eb(sd, rng, f"{t}.entropy_bottleneck", N)
    put_gaussian_buffers(sd, f"{t}.gaussian_conditional")


def ms_feature_sd(sd, rng, t, channels):
    cin = 3
    for i, c in enumerate(channels):
        put_conv_rbb(sd, rng, f"{t}.layer{i + 1}", cin, c, 3)
        cin = c


def temporal_enc_sd(sd, rng, t, in_ch, N=128, M=128):
    put_conv_rbb(sd, rng, f"{t}.g_a1", in_ch[0], N, 5)
    put_conv_rbb(sd, rng, f"{t}.g_a2", N + in_ch[1], N, 5)
    put_conv_rbb(sd, rng, f"{t}.g_a3", N + in_ch[2], M, 5)


def reconstructor_sd(sd, rng, t, channels, subpel):
    c1, c2, c3 = channels
    for i in range(3):
        put_rbb(sd, rng, f"{t}.layer3.{i}", c3)
    if subpel:
        put_conv(sd, rng, f"{t}.layer3.3.0", c3, c3 * 4, 3)
    else:
        put_deconv(sd, rng, f"{t}.layer3.3", c3, c3, 3)
    put_conv(sd, rng, f"{t}.layer2.0", c3 + c2, c2, 1)
    for i in range(3):
        put_rbb(sd, rng, f"{t}.layer2.{i + 1}", c2)
    if subpel:
        put_conv(sd, rng, f"{t}.layer2.4.0", c2, c2 * 4, 3)
    else:
        put_deconv(sd, rng, f"{t}.layer2.4", c2, c2, 3)
    put_conv(sd, rng, f"{t}.layer1.0", c2 + c1, c1, 1)
    for i in range(3):
        put_rbb(sd, rng, f"{t}.layer1.{i + 1}", c1)
    if subpel:
        put_conv(sd, rng, f"{t}.layer1.4.0", c1, 3 * 4, 3)
    else:
        put_deconv(sd, rng, f"{t}.layer1.4", c1, 3, 3)


def flownet_sd(sd, rng, t):
    widths = (32, 64, 128, 192)
    cin = 6
    for i, c in enumerate(widths):
        put_conv(sd, rng, f"{t}.down{i}.0", cin, c, 3)
        put_rbb(sd, rng, f"{t}.down{i}.1", c)
        put_rbb(sd, rng, f"{t}.down{i}.2", c)
        cin = c
    ups = ((192, 128), (128, 64), (64, 32), (32, 4))
    for u, (c, out) in enumerate(ups):
        base = 0
        if u > 0:
            put_conv(sd, rng, f"{t}.up{u}.0", 2 * c, c, 1)
            base = 1
        put_rbb(sd, rng, f"{t}.up{u}.{base}", c)
        put_rbb(sd, rng, f"{t}.up{u}.{base + 1}", c)
        put_conv(sd, rng, f"{t}.up{u}.{base + 2}.0", c, out * 4, 3)


def deform_sd(sd, rng, t, cin, cout, groups, k=3):
    sd[f"{t}.weight"] = _rnd(rng, (cout, cin // groups, k, k))
    sd[f"{t}.bias"] = _rnd(rng, (cout,))


def _shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_shapes(v, path))
        else:
            out[path] = tuple(np.shape(v))
    return out


def assert_tree_matches(imported, target_vars):
    got = _shapes(imported)
    want = _shapes(jax.tree.map(np.asarray, dict(target_vars["params"])))
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing, f"importer missing slots: {missing[:10]}"
    assert not extra, f"importer extra slots: {extra[:10]}"
    bad = [k for k in want if got[k] != want[k]]
    assert not bad, [(k, got[k], want[k]) for k in bad[:10]]


def test_deconv_matches_torch():
    torch = pytest.importorskip("torch")
    from tpuvc.models.layers import Deconv

    for k in (5, 3):
        tconv = torch.nn.ConvTranspose2d(
            3, 4, k, stride=2, padding=k // 2, output_padding=1
        )
        x = torch.randn(2, 3, 8, 6)
        with torch.no_grad():
            y_t = tconv(x).numpy()
        sd = {"d.weight": tconv.weight, "d.bias": tconv.bias}
        rep = ti.ImportReport()
        params = ti._deconv(sd, rep, "d")
        m = Deconv(4, kernel=k, stride=2)
        y_j = m.apply(
            {"params": jax.tree.map(jnp.asarray, params)},
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        )
        np.testing.assert_allclose(
            np.asarray(y_j).transpose(0, 3, 1, 2), y_t, atol=1e-5
        )


def test_elic_import_structure(rng):
    from tpuvc.models.elic import ELIC

    N, M = 64, 96  # smaller than the paper config; same topology
    groups = (8, 8, 16, 24, 40)
    sd = {}
    c = 3
    # g_a: conv/rbb/rbb/rbb/conv/rbb/rbb/rbb/attn/conv/rbb/rbb/rbb/conv/attn
    put_conv(sd, rng, "g_a.0", 3, N, 5)
    for i in (1, 2, 3):
        put_rbb(sd, rng, f"g_a.{i}", N)
    put_conv(sd, rng, "g_a.4", N, N, 5)
    for i in (5, 6, 7):
        put_rbb(sd, rng, f"g_a.{i}", N)
    put_attn(sd, rng, "g_a.8", N)
    put_conv(sd, rng, "g_a.9", N, N, 5)
    for i in (10, 11, 12):
        put_rbb(sd, rng, f"g_a.{i}", N)
    put_conv(sd, rng, "g_a.13", N, M, 5)
    put_attn(sd, rng, "g_a.14", M)
    # g_s: attn/deconv/rbb x3/deconv/attn/rbb x3/deconv/rbb x3/deconv
    put_attn(sd, rng, "g_s.0", M)
    put_deconv(sd, rng, "g_s.1", M, N, 5)
    for i in (2, 3, 4):
        put_rbb(sd, rng, f"g_s.{i}", N)
    put_deconv(sd, rng, "g_s.5", N, N, 5)
    put_attn(sd, rng, "g_s.6", N)
    for i in (7, 8, 9):
        put_rbb(sd, rng, f"g_s.{i}", N)
    put_deconv(sd, rng, "g_s.10", N, N, 5)
    for i in (11, 12, 13):
        put_rbb(sd, rng, f"g_s.{i}", N)
    put_deconv(sd, rng, "g_s.14", N, 3, 5)
    put_conv(sd, rng, "h_a.0", M, N, 3)
    put_conv(sd, rng, "h_a.2", N, N, 5)
    put_conv(sd, rng, "h_a.4", N, N, 5)
    put_deconv(sd, rng, "h_s.0", N, M, 5)
    put_deconv(sd, rng, "h_s.2", M, M * 3 // 2, 5)
    put_conv(sd, rng, "h_s.4", M * 3 // 2, M * 2, 3)
    put_entropy_head(sd, rng, "", M, groups, N=N)
    put_eb(sd, rng, "entropy_bottleneck", N)
    put_gaussian_buffers(sd, "gaussian_conditional")

    params, rep = ti.import_elic_state_dict(sd)
    assert rep.unused(sd) == []

    model = ELIC(N=N, M=M, groups=groups)
    target = model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)), "dequantize"
    )
    assert_tree_matches(params, target)


def _deform_b_sd(rng):
    sd = {}
    fc = (32, 64, 96)
    N = M = 128
    ms_feature_sd(sd, rng, "feature_extractor", fc)
    temporal_enc_sd(sd, rng, "offset_temp_encoder", tuple(2 * c for c in fc))
    cond_elic_sd(
        sd, rng, "offset_compressor",
        in_ch=tuple(3 * c for c in fc),
        cond_ch=tuple(2 * c for c in fc),
        head_ch=(432, 432, 432), N=N, M=M,
    )
    for lv, c in zip((1, 2, 3), fc):
        deform_sd(sd, rng, f"deconv_l{lv}_1", c, c, 8)
        deform_sd(sd, rng, f"deconv_l{lv}_2", c, c, 8)
    temporal_enc_sd(
        sd, rng, "residual_temp_encoder", tuple(2 * c for c in fc)
    )
    cond_elic_sd(
        sd, rng, "residual_compressor",
        in_ch=tuple(3 * c for c in fc),
        cond_ch=tuple(2 * c for c in fc),
        head_ch=tuple(2 * c for c in fc), N=N, M=M, pixel=True,
    )
    reconstructor_sd(
        sd, rng, "reconstructor", tuple(2 * c for c in fc), subpel=False
    )
    return sd


def test_deform_b_import_structure(rng):
    from tpuvc.models.deform_b import DeformB

    sd = _deform_b_sd(rng)
    params, rep = ti.import_deform_b_state_dict(sd)
    assert rep.unused(sd) == []

    model = DeformB()
    x = jnp.zeros((1, 64, 64, 3))
    target = model.init(
        jax.random.key(0), x, x, x, 0.0, "dequantize"
    )
    assert_tree_matches(params, target)


def _flowguided_sd(rng):
    sd = {}
    fc = (64, 96, 128)
    N = M = 128
    ms_feature_sd(sd, rng, "feature_extractor", fc)
    flownet_sd(sd, rng, "flow_estimator")
    temporal_enc_sd(
        sd, rng, "offset_temporal_conditioner", tuple(4 * c for c in fc)
    )
    cond_elic_sd(
        sd, rng, "offset_compressor",
        in_ch=tuple(5 * c for c in fc),
        cond_ch=tuple(4 * c for c in fc),
        head_ch=(432, 432, 432), N=N, M=M,
    )
    for lv, c in zip((1, 2, 3), fc):
        deform_sd(sd, rng, f"offset_diversity_l{lv}.fusion", 2 * c, c, 16)
    temporal_enc_sd(sd, rng, "residue_temporal_conditioner", fc)
    cond_elic_sd(
        sd, rng, "residual_compressor",
        in_ch=tuple(2 * c for c in fc),
        cond_ch=fc,
        head_ch=fc, N=N, M=M,
    )
    reconstructor_sd(sd, rng, "reconstructor", fc, subpel=True)
    return sd


def test_flowguided_import_structure(rng):
    from tpuvc.models.flowguided_b import FlowGuidedB

    sd = _flowguided_sd(rng)
    params, rep = ti.import_flowguided_state_dict(sd)
    assert rep.unused(sd) == []

    model = FlowGuidedB()
    x = jnp.zeros((1, 64, 64, 3))
    target = model.init(
        jax.random.key(0), x, x, x, 0.0, mode="dequantize"
    )
    assert_tree_matches(params, target)


def test_state_dict_wrapper_accepted(rng):
    sd = _deform_b_sd(rng)
    params, rep = ti.import_deform_b_state_dict({"state_dict": sd})
    assert "feature_extractor" in params
