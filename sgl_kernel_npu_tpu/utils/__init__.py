from sgl_kernel_npu_tpu.utils.common import (
    LANE,
    cdiv,
    interpret_default,
    next_power_of_2,
    round_up,
    sublane,
)

__all__ = [
    "LANE",
    "cdiv",
    "interpret_default",
    "next_power_of_2",
    "round_up",
    "sublane",
]
