from tpuvc.entropy.emath import lower_bound, likelihood_to_bits
from tpuvc.entropy.quant import ste_round, quantize
from tpuvc.entropy.bottleneck import FactorizedBottleneck
from tpuvc.entropy.gaussian import GaussianConditional, default_scale_table
from tpuvc.entropy.cdf import pmf_to_quantized_cdf

__all__ = [
    "lower_bound",
    "likelihood_to_bits",
    "ste_round",
    "quantize",
    "FactorizedBottleneck",
    "GaussianConditional",
    "default_scale_table",
    "pmf_to_quantized_cdf",
]
