"""Reference-checkpoint import: key mapping, layout conversion, numerics.

Builds a state dict with the reference LHBDC's exact key space and shapes
(/root/reference/LHBDC/model/{m,layers,flow}.py; compressai layer internals)
and checks that the imported tree drops into tpuvc's LHBDC untouched.
Numerics of each converted layer kind are validated against torch ops.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvc.models.lhbdc import LHBDC
from tpuvc.utils.torch_import import import_lhbdc_state_dict

pytestmark = pytest.mark.slow


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32) * 0.1


def _add_conv(sd, rng, key, o, i, k):
    sd[f"{key}.weight"] = _rand(rng, o, i, k, k)
    sd[f"{key}.bias"] = _rand(rng, o)


def _add_gdn(sd, rng, key, c):
    ped = 2.0 ** -36
    sd[f"{key}.beta"] = np.sqrt(1.0 + ped) * np.ones(c, np.float32)
    sd[f"{key}.gamma"] = np.sqrt(
        0.1 * np.eye(c, dtype=np.float32) + ped
    ) + 0.01 * np.abs(_rand(rng, c, c))


def _add_rb(sd, rng, key, i, o, skip=False):
    _add_conv(sd, rng, f"{key}.conv1", o, i, 3)
    _add_conv(sd, rng, f"{key}.conv2", o, o, 3)
    if skip:
        _add_conv(sd, rng, f"{key}.skip", o, i, 1)


def _add_rbs(sd, rng, key, i, o):
    _add_conv(sd, rng, f"{key}.conv1", o, i, 3)
    _add_conv(sd, rng, f"{key}.conv2", o, o, 3)
    _add_gdn(sd, rng, f"{key}.gdn", o)
    _add_conv(sd, rng, f"{key}.skip", o, i, 1)


def _add_rbu(sd, rng, key, c):
    _add_conv(sd, rng, f"{key}.subpel_conv.0", c * 4, c, 3)
    _add_conv(sd, rng, f"{key}.conv", c, c, 3)
    _add_gdn(sd, rng, f"{key}.igdn", c)
    _add_conv(sd, rng, f"{key}.upsample.0", c * 4, c, 3)


def _add_eb(sd, rng, key, c):
    dims = (1, 3, 3, 3, 3, 1)
    for idx in range(5):
        sd[f"{key}._matrices.{idx}"] = _rand(rng, c, dims[idx + 1], dims[idx])
        sd[f"{key}._biases.{idx}"] = _rand(rng, c, dims[idx + 1], 1)
        if idx < 4:
            sd[f"{key}._factors.{idx}"] = _rand(rng, c, dims[idx + 1], 1)
    sd[f"{key}.quantiles"] = np.tile(
        np.array([-10.0, 0.0, 10.0], np.float32), (c, 1, 1)
    )
    # buffers the importer must skip, not choke on
    sd[f"{key}._offset"] = np.zeros(c, np.float32)
    sd[f"{key}._quantized_cdf"] = np.zeros((c, 10), np.float32)
    sd[f"{key}._cdf_length"] = np.zeros(c, np.float32)
    sd[f"{key}.target"] = np.zeros(3, np.float32)


def _add_hyperprior(sd, rng, key, n, in_ch, out_ch):
    _add_rbs(sd, rng, f"{key}.g_a.0", in_ch, n)
    _add_rb(sd, rng, f"{key}.g_a.1", n, n)
    _add_rbs(sd, rng, f"{key}.g_a.2", n, n)
    _add_rb(sd, rng, f"{key}.g_a.3", n, n)
    _add_rbs(sd, rng, f"{key}.g_a.4", n, n)
    _add_rb(sd, rng, f"{key}.g_a.5", n, n)
    _add_conv(sd, rng, f"{key}.g_a.6", n, n, 3)
    for idx in (0, 2, 4, 6, 8):
        _add_conv(sd, rng, f"{key}.h_a.{idx}", n, n, 3)
    _add_conv(sd, rng, f"{key}.h_s.0", n, n, 3)
    _add_conv(sd, rng, f"{key}.h_s.2.0", n * 4, n, 3)
    _add_conv(sd, rng, f"{key}.h_s.4", n * 3 // 2, n, 3)
    _add_conv(sd, rng, f"{key}.h_s.6.0", n * 6, n * 3 // 2, 3)
    _add_conv(sd, rng, f"{key}.h_s.8", n * 2, n * 3 // 2, 3)
    _add_rb(sd, rng, f"{key}.g_s.0", n, n)
    _add_rbu(sd, rng, f"{key}.g_s.1", n)
    _add_rb(sd, rng, f"{key}.g_s.2", n, n)
    _add_rbu(sd, rng, f"{key}.g_s.3", n)
    _add_rb(sd, rng, f"{key}.g_s.4", n, n)
    _add_rbu(sd, rng, f"{key}.g_s.5", n)
    _add_rb(sd, rng, f"{key}.g_s.6", n, n)
    _add_conv(sd, rng, f"{key}.g_s.7.0", out_ch * 4, n, 3)
    _add_eb(sd, rng, f"{key}.entropy_bottleneck", n)


def make_reference_state_dict(rng, n=8):
    sd = {}
    chans = [(8, 32), (32, 64), (64, 32), (32, 16), (16, 2)]
    for lv in range(6):
        for k, (ci, co) in zip((0, 2, 4, 6, 8), chans):
            _add_conv(sd, rng, f"FlowNet.netBasic.{lv}.netBasic.{k}", co, ci, 7)
    _add_hyperprior(sd, rng, "mv_compressor", n, 4, 4)
    _add_hyperprior(sd, rng, "residual_compressor", n, 3, 3)
    ch = 32
    _add_conv(sd, rng, "masknet.conv1", ch, 6, 5)
    _add_conv(sd, rng, "masknet.conv2", ch * 2, ch, 5)
    _add_conv(sd, rng, "masknet.conv3", ch * 4, ch * 2, 3)
    _add_conv(sd, rng, "masknet.bottleneck", ch * 4, ch * 4, 3)
    _add_conv(sd, rng, "masknet.deconv1", ch * 4, ch * 8, 3)
    _add_conv(sd, rng, "masknet.deconv2", ch * 2, ch * 6, 5)
    _add_conv(sd, rng, "masknet.deconv3", ch, ch * 3, 5)
    _add_conv(sd, rng, "masknet.conv4", 1, ch, 5)
    return sd


def _add_unet(sd, rng, key, in_ch, out_ch, depth, wf=5):
    prev = in_ch
    for i in range(depth):
        w = 2 ** (wf + i)
        _add_conv(sd, rng, f"{key}.down_path.{i}.block.0", w, prev, 3)
        _add_conv(sd, rng, f"{key}.down_path.{i}.block.2", w, w, 3)
        prev = w
    _add_conv(sd, rng, f"{key}.midconv", prev, prev, 3)
    for j, i in enumerate(reversed(range(depth - 1))):
        w = 2 ** (wf + i)
        _add_conv(sd, rng, f"{key}.up_path.{j}.up.1", w, prev, 3)
        _add_conv(sd, rng, f"{key}.up_path.{j}.conv_block.block.0", w, 2 * w, 3)
        _add_conv(sd, rng, f"{key}.up_path.{j}.conv_block.block.2", w, w, 3)
        prev = w
    _add_conv(sd, rng, f"{key}.last", out_ch, prev, 3)


def make_flexrate_state_dict(rng, n=8, levels=6):
    sd = {}
    _add_unet(sd, rng, "flow_predictor", 6, 4, depth=5)
    _add_unet(sd, rng, "Mask", 16, 2, depth=4)
    for key, in_ch, out_ch in (
        ("flow_compressor", 19, 4),
        ("residual_compressor", 3, 3),
    ):
        _add_hyperprior(sd, rng, key, n, in_ch, out_ch)
        for g in ("gain_unit", "inv_gain_unit",
                  "hyper_gain_unit", "hyper_inv_gain_unit"):
            sd[f"{key}.{g}.gain_matrix"] = np.ones((levels, n), np.float32)
    # Random 0.1-std weights explode through the depth-5 UNet (512-ch convs
    # gain ~7x per layer); damp so the finite-forward check is meaningful.
    for k in sd:
        if k.endswith(".weight"):
            sd[k] = sd[k] * 0.12
    return sd


class TestImportTree:
    def test_tree_matches_init(self, rng):
        sd = make_reference_state_dict(rng, n=8)
        params, rep = import_lhbdc_state_dict(sd)
        assert not rep.unused(sd), rep.unused(sd)[:10]

        model = LHBDC(N=8)
        x = jnp.zeros((1, 192, 192, 3), jnp.float32)
        ref = model.init(jax.random.key(0), x, x, x, "dequantize")["params"]
        flat_ref = {
            jax.tree_util.keystr(p): tuple(v.shape)
            for p, v in jax.tree_util.tree_flatten_with_path(ref)[0]
        }
        flat_got = {
            jax.tree_util.keystr(p): tuple(v.shape)
            for p, v in jax.tree_util.tree_flatten_with_path(params)[0]
        }
        assert set(flat_ref) == set(flat_got), (
            sorted(set(flat_ref) ^ set(flat_got))[:10]
        )
        for k in flat_ref:
            assert flat_ref[k] == flat_got[k], (k, flat_ref[k], flat_got[k])

    def test_flexrate_tree_matches_init(self, rng):
        from tpuvc.models.flexrate import BidirFlowRef
        from tpuvc.utils.torch_import import import_flexrate_state_dict

        sd = make_flexrate_state_dict(rng, n=8)
        params, rep = import_flexrate_state_dict(sd)
        assert not rep.unused(sd), rep.unused(sd)[:10]

        model = BidirFlowRef(N=8)
        x = jnp.zeros((1, 128, 128, 3), jnp.float32)
        ref = model.init(
            jax.random.key(0), x, x, x, 0, 1.0, "dequantize"
        )["params"]
        flat_ref = {
            jax.tree_util.keystr(p): tuple(v.shape)
            for p, v in jax.tree_util.tree_flatten_with_path(ref)[0]
        }
        flat_got = {
            jax.tree_util.keystr(p): tuple(v.shape)
            for p, v in jax.tree_util.tree_flatten_with_path(params)[0]
        }
        assert set(flat_ref) == set(flat_got), (
            sorted(set(flat_ref) ^ set(flat_got))[:10]
        )
        for k in flat_ref:
            assert flat_ref[k] == flat_got[k], (k, flat_ref[k], flat_got[k])

    def test_flexrate_forward_runs(self, rng):
        from tpuvc.models.flexrate import BidirFlowRef
        from tpuvc.utils.torch_import import import_flexrate_state_dict

        sd = make_flexrate_state_dict(rng, n=8)
        params, _ = import_flexrate_state_dict(sd)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        model = BidirFlowRef(N=8)
        x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
        out = model.apply(
            {"params": params}, x, x, x, 2, 0.7, "dequantize"
        )
        assert bool(jnp.all(jnp.isfinite(out["x_hat"])))

    def test_state_dict_wrapper(self, rng):
        sd = make_reference_state_dict(rng, n=8)
        params, _ = import_lhbdc_state_dict({"state_dict": sd})
        assert "flownet" in params

    def test_forward_runs(self, rng):
        sd = make_reference_state_dict(rng, n=8)
        params, _ = import_lhbdc_state_dict(sd)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        model = LHBDC(N=8)
        x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
        out = model.apply({"params": params}, x, x, x, "dequantize")
        assert bool(jnp.all(jnp.isfinite(out["x_hat"])))
        assert bool(jnp.isfinite(out["rate"]))


torch = pytest.importorskip("torch")


class TestLayerNumerics:
    """Converted layers reproduce the torch ops they came from."""

    def test_conv_layout(self, rng):
        import torch.nn.functional as F

        from tpuvc.models.layers import Conv

        w = _rand(rng, 16, 5, 3, 3)  # OIHW
        b = _rand(rng, 16)
        x = _rand(rng, 1, 5, 12, 10)  # NCHW
        ref = F.conv2d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=2, padding=1,
        ).numpy()

        conv = Conv(16, kernel=3, stride=2)
        params = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                  "bias": jnp.asarray(b)}
        out = conv.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            out.transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5
        )

    def test_subpel_layout(self, rng):
        import torch.nn.functional as F

        from tpuvc.models.layers import SubpelConv

        c, r = 6, 2
        w = _rand(rng, c * r * r, 4, 3, 3)
        b = _rand(rng, c * r * r)
        x = _rand(rng, 1, 4, 8, 8)
        y = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                     torch.from_numpy(b), padding=1)
        ref = F.pixel_shuffle(y, r).numpy()

        sub = SubpelConv(c, r=r)
        params = {"Conv_0": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                             "bias": jnp.asarray(b)}}
        out = sub.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            out.transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5
        )

    def test_gdn_formula(self, rng):
        """tpuvc GDN with imported raw params == compressai's computation:
        y = x / sqrt(beta + gamma @ x^2) with sqrt-domain reparam + pedestal."""
        import torch.nn.functional as F

        from tpuvc.models.layers import GDN

        c = 5
        ped = 2.0 ** -36
        beta_raw = np.sqrt(1.0 + ped) * np.ones(c, np.float32)
        gamma_raw = (
            np.sqrt(0.1 * np.eye(c, dtype=np.float32) + ped)
            + 0.05 * np.abs(_rand(rng, c, c))
        )
        x = _rand(rng, 1, c, 6, 6)

        # torch-side (compressai GDN semantics)
        beta_bound = (1e-6 + ped) ** 0.5
        beta = np.maximum(beta_raw, beta_bound) ** 2 - ped
        gamma_bound = 2.0 ** -18
        gamma = np.maximum(gamma_raw, gamma_bound) ** 2 - ped
        norm = F.conv2d(
            torch.from_numpy(x) ** 2,
            torch.from_numpy(gamma.reshape(c, c, 1, 1)),
            torch.from_numpy(beta.astype(np.float32)),
        )
        ref = (torch.from_numpy(x) / torch.sqrt(norm)).numpy()

        gdn = GDN()
        params = {"beta": jnp.asarray(beta_raw), "gamma": jnp.asarray(gamma_raw)}
        out = gdn.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            out.transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5
        )
