from tpu_plume.ops.gather import (
    bank_cell_lookup,
    bilinear_onehot,
    bilinear_xla,
    trilinear_xla,
    trilinear_zyx_xla,
)

__all__ = [
    "bank_cell_lookup",
    "bilinear_onehot",
    "bilinear_xla",
    "trilinear_xla",
    "trilinear_zyx_xla",
]
