"""compressai.models base classes the reference subclasses.

Every reference subclass overrides g_a/g_s/h_a/h_s (verified by grep over
/root/reference), so the parents here build empty placeholders for those
and the REAL entropy modules + the dead `context_prediction` the genuine
checkpoints carry (cf. tpuvc.utils.torch_import._DEAD_PREFIX_PARTS).
"""

import torch.nn as nn

from compressai.entropy_models import EntropyBottleneck, GaussianConditional
from compressai.layers import MaskedConv2d


class CompressionModel(nn.Module):
    def aux_loss(self):
        return sum(
            m.loss() for m in self.modules()
            if isinstance(m, EntropyBottleneck) and hasattr(m, "loss")
        )

    def update(self, *a, **k):
        raise NotImplementedError("shim: forward/likelihood parity only")


class MeanScaleHyperprior(CompressionModel):
    """forward() per compressai: factorized-coded z conditions a
    mean+scale Gaussian over y."""

    def __init__(self, N=192, M=192, **kwargs):
        super().__init__()
        self.N = int(N)
        self.M = int(M)
        self.entropy_bottleneck = EntropyBottleneck(self.N)
        self.gaussian_conditional = GaussianConditional(None)
        # Overridden by every reference subclass; empty keeps state_dict
        # identical to the genuine checkpoints.
        self.g_a = nn.Sequential()
        self.g_s = nn.Sequential()
        self.h_a = nn.Sequential()
        self.h_s = nn.Sequential()

    def forward(self, x):
        y = self.g_a(x)
        z = self.h_a(y)
        z_hat, z_likelihoods = self.entropy_bottleneck(z)
        gaussian_params = self.h_s(z_hat)
        scales_hat, means_hat = gaussian_params.chunk(2, 1)
        y_hat, y_likelihoods = self.gaussian_conditional(
            y, scales_hat, means=means_hat
        )
        x_hat = self.g_s(y_hat)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": y_likelihoods, "z": z_likelihoods},
        }


class JointAutoregressiveHierarchicalPriors(CompressionModel):
    def __init__(self, N=192, M=192, **kwargs):
        super().__init__()
        self.N = int(N)
        self.M = int(M)
        self.entropy_bottleneck = EntropyBottleneck(self.N)
        self.gaussian_conditional = GaussianConditional(None)
        # Dead in every reference subclass but present in checkpoints.
        self.context_prediction = MaskedConv2d(
            M, 2 * M, kernel_size=5, padding=2, stride=1
        )
        self.g_a = nn.Sequential()
        self.g_s = nn.Sequential()
        self.h_a = nn.Sequential()
        self.h_s = nn.Sequential()
        self.entropy_parameters = nn.Sequential()


class Cheng2020Anchor(JointAutoregressiveHierarchicalPriors):
    pass
