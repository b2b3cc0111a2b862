"""Expert-parallel communication (DeepEP-equivalent) over a jax.sharding.Mesh."""

from sgl_kernel_npu_tpu.parallel.buffer import Buffer, EventOverlap
from sgl_kernel_npu_tpu.parallel.layered import combine_layered, dispatch_layered
from sgl_kernel_npu_tpu.parallel.layout import get_dispatch_layout

__all__ = [
    "Buffer",
    "EventOverlap",
    "get_dispatch_layout",
    "dispatch_layered",
    "combine_layered",
]
