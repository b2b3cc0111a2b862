"""Paged KV-cache management: allocation, location assignment, cache writes, offload."""

from sgl_kernel_npu_tpu.ops.mem_cache.allocator import alloc_extend, alloc_decode
from sgl_kernel_npu_tpu.ops.mem_cache.cache_ops import (
    assign_cache_op,
    cache_loc_assign,
    cache_loc_update,
)
from sgl_kernel_npu_tpu.ops.mem_cache.kv_cache import (
    reshape_and_cache,
    reshape_and_cache_transposed,
)

__all__ = [
    "alloc_extend",
    "alloc_decode",
    "assign_cache_op",
    "cache_loc_assign",
    "cache_loc_update",
    "reshape_and_cache",
    "reshape_and_cache_transposed",
]
