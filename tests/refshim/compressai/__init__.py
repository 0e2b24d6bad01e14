"""Minimal, faithful reimplementation of the compressai modules the
reference repositories import — test scaffolding ONLY.

Purpose (VERDICT r3 task #1): the machine running this suite has no
`compressai`/`torchvision` wheels, but it does have torch-cpu, so the
reference's own model code (/root/reference/LHBDC/model/m.py,
Flex-Rate…/b_model/*.py, ICIP2023/24 src/model/*.py) can be EXECUTED as a
numerical oracle once these imports resolve. tests/test_reference_parity.py
loads the reference modules against this shim, pushes the identical
weights through tpuvc.utils.torch_import, and asserts stage-by-stage
agreement between the reference torch forward and the tpuvc forward.

Every formula here follows the published CompressAI semantics
(InterDigital compressai, BSD-3): NonNegativeParametrizer's sqrt-domain
reparameterization with pedestal 2^-18, EntropyBottleneck's
matrices/biases/factors logistic-spline cumulative, GaussianConditional's
erfc cumulative with the 0.11 scale lower bound. No code is copied from
the reference repo; this is the dependency the reference assumes.
"""
