"""tpuvc — a TPU-native learned video compression framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
KUIS-AI-Tekalp-Research-Group/video-compression codec family:

- LHBDC (TIP'21): hierarchical bi-directional B-frame codec with SPyNet flow.
- Flex-Rate (ICIP'22): gain-unit flexible rate, UNet flow prediction+refinement.
- ICIP2023: multi-scale deformable alignment + ELIC checkerboard entropy.
- ICIP2024: flow-guided alignment, offset diversity, motion-adaptive inference.
- OJSP2025: content-adaptive P-frame coding (adaptive downsampling + MV scaling).

Layout (see SURVEY.md section 7.1):
    ops/      device kernels: warp, resize-as-matmul, deform conv, pixelshuffle
    entropy/  factorized bottleneck, Gaussian conditional, quantizers, CDFs
    coder/    host C++ rANS + bitstream containers
    models/   flow nets, transforms, gain units, ELIC, full codecs
    gop/      coding orders, decoded picture buffer, rate control, adaptive inference
    data/     frame IO, Vimeo-90k / UVG datasets
    train/    RD losses, trainers, data-parallel mesh
    eval/     PSNR/MS-SSIM, infographic ledger, BD-rate, plots
    cli/      encode_b / decode_b / test / train entry points
"""

__version__ = "0.1.0"
