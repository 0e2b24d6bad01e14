"""EntropyBottleneck + GaussianConditional (compressai semantics)."""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from compressai.ops import LowerBound


def quantize_st(inputs, mode, means=None):
    if mode == "noise":
        noise = torch.empty_like(inputs).uniform_(-0.5, 0.5)
        return inputs + noise
    outputs = inputs.clone()
    if means is not None:
        outputs -= means
    outputs = torch.round(outputs)
    if mode == "dequantize":
        if means is not None:
            outputs += means
        return outputs
    assert mode == "symbols", mode
    return outputs.int()


class EntropyBottleneck(nn.Module):
    """Univariate factorized prior: a per-channel monotone spline
    parameterized by _matrices/_biases/_factors; likelihood of the
    quantized value is the difference of the spline's sigmoid at ±0.5."""

    def __init__(self, channels, tail_mass=1e-9, init_scale=10.0,
                 filters=(3, 3, 3, 3), likelihood_bound=1e-9):
        super().__init__()
        self.channels = int(channels)
        self.filters = tuple(int(f) for f in filters)
        self.init_scale = float(init_scale)
        self.tail_mass = float(tail_mass)

        filters_ext = (1,) + self.filters + (1,)
        scale = self.init_scale ** (1 / (len(self.filters) + 1))
        self._matrices = nn.ParameterList()
        self._biases = nn.ParameterList()
        self._factors = nn.ParameterList()
        for i in range(len(self.filters) + 1):
            init = math.log(math.expm1(1 / scale / filters_ext[i + 1]))
            matrix = torch.full(
                (self.channels, filters_ext[i + 1], filters_ext[i]), init
            )
            self._matrices.append(nn.Parameter(matrix))
            bias = torch.empty(self.channels, filters_ext[i + 1], 1)
            nn.init.uniform_(bias, -0.5, 0.5)
            self._biases.append(nn.Parameter(bias))
            if i < len(self.filters):
                factor = torch.zeros(self.channels, filters_ext[i + 1], 1)
                self._factors.append(nn.Parameter(factor))

        self.quantiles = nn.Parameter(
            torch.Tensor([-self.init_scale, 0.0, self.init_scale])
            .repeat(self.channels, 1, 1)
        )
        target = math.log(2 / self.tail_mass - 1)
        self.register_buffer("target", torch.Tensor([-target, 0, target]))
        self.likelihood_lower_bound = LowerBound(likelihood_bound)
        # Buffers real compressai fills in update(); present so state_dict
        # key space matches genuine checkpoints.
        self.register_buffer("_offset", torch.IntTensor())
        self.register_buffer("_quantized_cdf", torch.IntTensor())
        self.register_buffer("_cdf_length", torch.IntTensor())

    def _get_medians(self):
        return self.quantiles[:, :, 1:2]

    def _logits_cumulative(self, inputs, stop_gradient=False):
        logits = inputs
        for i in range(len(self.filters) + 1):
            matrix = self._matrices[i]
            if stop_gradient:
                matrix = matrix.detach()
            logits = torch.matmul(F.softplus(matrix), logits)
            bias = self._biases[i]
            if stop_gradient:
                bias = bias.detach()
            logits = logits + bias
            if i < len(self._factors):
                factor = self._factors[i]
                if stop_gradient:
                    factor = factor.detach()
                logits = logits + torch.tanh(factor) * torch.tanh(logits)
        return logits

    def _likelihood(self, inputs):
        lower = self._logits_cumulative(inputs - 0.5)
        upper = self._logits_cumulative(inputs + 0.5)
        sign = -torch.sign(lower + upper).detach()
        return torch.abs(
            torch.sigmoid(sign * upper) - torch.sigmoid(sign * lower)
        )

    def forward(self, x):
        # (B, C, ...) -> (C, 1, B*...)
        perm = (1, 0) + tuple(range(2, x.dim()))
        shape = x.shape
        values = x.permute(*perm).contiguous().reshape(self.channels, 1, -1)
        outputs = quantize_st(
            values, "noise" if self.training else "dequantize",
            self._get_medians(),
        )
        likelihood = self.likelihood_lower_bound(self._likelihood(outputs))
        outputs = (
            outputs.reshape(shape[1], shape[0], *shape[2:]).permute(*perm)
        )
        likelihood = (
            likelihood.reshape(shape[1], shape[0], *shape[2:]).permute(*perm)
        )
        return outputs, likelihood

    def quantize(self, inputs, mode, means=None):
        return quantize_st(inputs, mode, means)

    def compress(self, *a, **k):
        raise NotImplementedError("shim: forward/likelihood parity only")

    def decompress(self, *a, **k):
        raise NotImplementedError("shim: forward/likelihood parity only")


class GaussianConditional(nn.Module):
    def __init__(self, scale_table=None, scale_bound=0.11, tail_mass=1e-9,
                 likelihood_bound=1e-9):
        super().__init__()
        self.tail_mass = float(tail_mass)
        self.lower_bound_scale = LowerBound(scale_bound)
        self.likelihood_lower_bound = LowerBound(likelihood_bound)
        self.register_buffer(
            "scale_table",
            torch.Tensor(list(scale_table)) if scale_table else torch.Tensor(),
        )
        self.register_buffer("_offset", torch.IntTensor())
        self.register_buffer("_quantized_cdf", torch.IntTensor())
        self.register_buffer("_cdf_length", torch.IntTensor())

    @staticmethod
    def _standardized_cumulative(x):
        return 0.5 * torch.erfc(-(2 ** -0.5) * x)

    def _likelihood(self, inputs, scales, means=None):
        values = inputs - means if means is not None else inputs
        scales = self.lower_bound_scale(scales)
        values = torch.abs(values)
        upper = self._standardized_cumulative((0.5 - values) / scales)
        lower = self._standardized_cumulative((-0.5 - values) / scales)
        return upper - lower

    def forward(self, inputs, scales, means=None):
        outputs = quantize_st(
            inputs, "noise" if self.training else "dequantize", means
        )
        likelihood = self.likelihood_lower_bound(
            self._likelihood(outputs, scales, means)
        )
        return outputs, likelihood

    def quantize(self, inputs, mode, means=None):
        return quantize_st(inputs, mode, means)

    def build_indexes(self, scales):
        scales = self.lower_bound_scale(scales)
        indexes = scales.new_full(scales.size(), len(self.scale_table) - 1)
        for s in self.scale_table[:-1]:
            indexes -= (scales <= s).int()
        return indexes.int()

    def compress(self, *a, **k):
        raise NotImplementedError("shim: forward/likelihood parity only")

    def decompress(self, *a, **k):
        raise NotImplementedError("shim: forward/likelihood parity only")
