"""torchvision shim: only the deformable-conv op the reference imports
(torchvision.ops.DeformConv2d / torchvision.ops.deform_conv). See
tests/refshim/compressai/__init__.py for why this exists."""
