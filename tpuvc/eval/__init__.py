from tpuvc.eval.metrics import mse, psnr, psnr_uint8, msssim

__all__ = ["mse", "psnr", "psnr_uint8", "msssim"]
