"""LowerBound + NonNegativeParametrizer (compressai.ops semantics)."""

import torch
import torch.nn as nn


class LowerBoundFn(torch.autograd.Function):
    @staticmethod
    def forward(ctx, x, bound):
        ctx.save_for_backward(x, bound)
        return torch.max(x, bound)

    @staticmethod
    def backward(ctx, grad_output):
        x, bound = ctx.saved_tensors
        pass_through = (x >= bound) | (grad_output < 0)
        return pass_through.type_as(grad_output) * grad_output, None


class LowerBound(nn.Module):
    def __init__(self, bound: float):
        super().__init__()
        self.register_buffer(
            "bound", torch.Tensor([float(bound)]), persistent=False
        )

    def forward(self, x):
        return LowerBoundFn.apply(x, self.bound)


class NonNegativeParametrizer(nn.Module):
    """Stores values in sqrt domain: init(x) = sqrt(max(x + pedestal,
    pedestal)); forward(x) = max(x, bound)^2 - pedestal, with
    pedestal = (2^-18)^2 and bound = (minimum + pedestal)^0.5."""

    def __init__(self, minimum: float = 0.0, reparam_offset: float = 2 ** -18):
        super().__init__()
        self.minimum = float(minimum)
        self.reparam_offset = float(reparam_offset)
        pedestal = self.reparam_offset ** 2
        self.register_buffer(
            "pedestal", torch.Tensor([pedestal]), persistent=False
        )
        bound = (self.minimum + self.reparam_offset ** 2) ** 0.5
        self.lower_bound = LowerBound(bound)

    def init(self, x):
        return torch.sqrt(torch.max(x + self.pedestal, self.pedestal))

    def forward(self, x):
        return torch.pow(self.lower_bound(x), 2) - self.pedestal
