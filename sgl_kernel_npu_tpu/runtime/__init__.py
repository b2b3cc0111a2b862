"""Native (C++) host-runtime components."""

from sgl_kernel_npu_tpu.runtime.cache_manager import RadixCacheManager

__all__ = ["RadixCacheManager"]
