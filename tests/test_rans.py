import numpy as np
import pytest

from tpuvc.coder import decode_with_indexes, encode_with_indexes
from tpuvc.entropy.cdf import build_cdf_table, pmf_to_quantized_cdf


class TestPmfToQuantizedCdf:
    def test_basic_properties(self):
        pmf = np.array([0.1, 0.2, 0.3, 0.4])
        cdf = pmf_to_quantized_cdf(pmf, 16)
        assert cdf[0] == 0 and cdf[-1] == 1 << 16
        assert np.all(np.diff(cdf) >= 1)

    def test_zero_prob_symbols_get_floor(self):
        pmf = np.array([1.0, 0.0, 0.0])
        cdf = pmf_to_quantized_cdf(pmf, 16)
        assert np.all(np.diff(cdf) >= 1)
        assert cdf[-1] == 1 << 16

    def test_close_to_proportional(self):
        pmf = np.array([0.5, 0.25, 0.125, 0.125])
        freqs = np.diff(pmf_to_quantized_cdf(pmf, 16))
        np.testing.assert_allclose(freqs / 65536.0, pmf, atol=1e-3)


def _uniform_table(n_rows=4, n_sym=16):
    pmfs = np.full((n_rows, n_sym), 1.0 / n_sym)
    lengths = np.full(n_rows, n_sym, dtype=np.int32)
    tails = np.full(n_rows, 1e-6)
    cdfs, cdf_lengths = build_cdf_table(pmfs, lengths, tails)
    offsets = np.full(n_rows, -(n_sym // 2), dtype=np.int32)
    return cdfs, cdf_lengths, offsets


class TestRansRoundTrip:
    def test_in_range_symbols(self, rng):
        cdfs, lens, offs = _uniform_table()
        n = 5000
        indexes = rng.integers(0, 4, n)
        symbols = rng.integers(-8, 8, n)  # in range given offset -8, 16 slots
        stream = encode_with_indexes(symbols, indexes, cdfs, lens, offs)
        dec = decode_with_indexes(stream, indexes, cdfs, lens, offs)
        np.testing.assert_array_equal(dec, symbols)

    def test_escape_symbols(self, rng):
        cdfs, lens, offs = _uniform_table()
        symbols = np.array([-1000, -9, -8, 7, 8, 123456, 0, 2_000_000_000])
        indexes = np.array([0, 1, 2, 3, 0, 1, 2, 3])
        stream = encode_with_indexes(symbols, indexes, cdfs, lens, offs)
        dec = decode_with_indexes(stream, indexes, cdfs, lens, offs)
        np.testing.assert_array_equal(dec, symbols)

    def test_empty(self):
        cdfs, lens, offs = _uniform_table()
        stream = encode_with_indexes([], [], cdfs, lens, offs)
        dec = decode_with_indexes(stream, [], cdfs, lens, offs)
        assert dec.size == 0

    def test_skewed_distribution_compresses(self, rng):
        # A heavily skewed source should code near its entropy.
        n_sym = 8
        pmf = np.array([0.9, 0.05, 0.02, 0.01, 0.01, 0.005, 0.0025, 0.0025])
        cdfs, lens = build_cdf_table(pmf[None], np.array([n_sym]), np.array([1e-9]))
        offs = np.zeros(1, dtype=np.int32)
        n = 100_000
        symbols = rng.choice(n_sym, size=n, p=pmf)
        indexes = np.zeros(n, dtype=np.int32)
        stream = encode_with_indexes(symbols, indexes, cdfs, lens, offs)
        entropy_bits = -np.sum(pmf * np.log2(pmf)) * n
        assert len(stream) * 8 < entropy_bits * 1.02 + 64

    def test_stream_deterministic(self, rng):
        cdfs, lens, offs = _uniform_table()
        symbols = rng.integers(-8, 8, 100)
        indexes = rng.integers(0, 4, 100)
        s1 = encode_with_indexes(symbols, indexes, cdfs, lens, offs)
        s2 = encode_with_indexes(symbols, indexes, cdfs, lens, offs)
        assert s1 == s2

    def test_many_tables_round_trip(self, rng):
        # Gaussian-conditional-like tables of varying widths.
        from tpuvc.entropy.gaussian import GaussianConditional

        gc = GaussianConditional()
        tables = gc.build_tables()
        n = 20000
        indexes = rng.integers(0, 64, n)
        # Draw symbols roughly matching each index's scale.
        scales = gc.scale_table[indexes]
        symbols = np.round(rng.standard_normal(n) * scales).astype(np.int64)
        stream = encode_with_indexes(
            symbols, indexes, tables.cdfs, tables.cdf_lengths, tables.offsets
        )
        dec = decode_with_indexes(
            stream, indexes, tables.cdfs, tables.cdf_lengths, tables.offsets
        )
        np.testing.assert_array_equal(dec, symbols)


class TestNativeCdfQuantizer:
    def test_matches_numpy(self, rng):
        from tpuvc.coder.rans import pmf_to_quantized_cdf_native

        for trial in range(50):
            n = int(rng.integers(1, 300))
            pmf = rng.random(n) ** 3
            if trial % 3 == 0:
                pmf[rng.integers(0, n)] = 0.0
            a = pmf_to_quantized_cdf(pmf)
            b = pmf_to_quantized_cdf_native(pmf)
            np.testing.assert_array_equal(a, b)
