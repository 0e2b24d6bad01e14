from tpuvc.coder.rans import encode_with_indexes, decode_with_indexes

__all__ = ["encode_with_indexes", "decode_with_indexes"]
