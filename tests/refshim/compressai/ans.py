"""Stubs: the parity harness exercises forward/likelihood paths only; the
real-bitstream parity lives in tpuvc's own rANS (tests/test_rans.py)."""


class BufferedRansEncoder:
    def __init__(self, *a, **k):
        raise NotImplementedError("shim: no entropy coding")


class RansDecoder:
    def __init__(self, *a, **k):
        raise NotImplementedError("shim: no entropy coding")
