from tpuvc.gop.order import (
    GOP8_ORDER,
    GOP16_ORDER,
    gop_coding_table,
    get_order_typ_list,
)
from tpuvc.gop.dpb import DecodedPictureBuffer

__all__ = [
    "GOP8_ORDER",
    "GOP16_ORDER",
    "gop_coding_table",
    "get_order_typ_list",
    "DecodedPictureBuffer",
]
