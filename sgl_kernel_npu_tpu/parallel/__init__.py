"""Expert-parallel communication (DeepEP-equivalent) over a jax.sharding.Mesh."""

from sgl_kernel_npu_tpu.parallel.buffer import Buffer, EventOverlap
from sgl_kernel_npu_tpu.parallel.layout import get_dispatch_layout

__all__ = ["Buffer", "EventOverlap", "get_dispatch_layout"]
