"""Host↔device paged KV transfer (L1/L2 radix-cache offload).

Capability parity with reference ``kvcacheio.transfer_kv_dim_exchange``
(python/sgl_kernel_npu/.../kvcacheio.py:16; csrc/transfer_kv_dim_exchange: per-page
``aclrtMemcpyAsync`` with a layer-major-device ↔ page-major-host dim exchange).

TPU design: the device side is a page gather/scatter (one fused XLA op); the host
side is numpy.  The dim exchange falls out of indexing — device caches are
per-layer arrays ``[pages, ...]`` while the host pool is page-major
``[host_pages, num_layers, ...]`` so one host page holds all layers of a token
page contiguously (sequential host memory for disk/NIC streaming, same rationale
as the reference's layout).
"""

from __future__ import annotations

from enum import Enum

import jax
import jax.numpy as jnp
import numpy as np


class TransferDirection(Enum):
    H2D = 1
    D2H = 2


class TransferFlag(Enum):
    FAST2D = 2


def transfer_kv_dim_exchange(
    device_indices,
    host_indices,
    device_k: list[jax.Array],
    host_k: np.ndarray,
    device_v: list[jax.Array] | None = None,
    host_v: np.ndarray | None = None,
    *,
    page_size: int = 128,
    direction: TransferDirection = TransferDirection.H2D,
    flags: TransferFlag = TransferFlag.FAST2D,
):
    """Move KV pages between per-layer device caches and a page-major host pool.

    Args:
        device_indices / host_indices: page ids on each side, same length.
        device_k: per-layer list of ``[pages, ...]`` device arrays.
        host_k: ``[host_pages, num_layers, ...]`` numpy pool.

    Returns ``(device_k, host_k, device_v, host_v)`` with the moved pages applied
    (device lists contain new arrays; host pools are updated in place).
    """
    d_idx = np.asarray(device_indices, np.int64)
    h_idx = np.asarray(host_indices, np.int64)
    assert d_idx.shape == h_idx.shape

    def one(dev_layers, host_pool):
        if host_pool is None or dev_layers is None:
            return dev_layers, host_pool
        if direction == TransferDirection.D2H:
            # gather pages from every layer in one device op, then one host write
            stacked = jnp.stack([layer[jnp.asarray(d_idx)] for layer in dev_layers], axis=1)
            host_pool[h_idx] = np.asarray(stacked)
        else:
            pages = jnp.asarray(host_pool[h_idx])  # [n, layers, ...]
            dev_layers = [
                layer.at[jnp.asarray(d_idx)].set(pages[:, li].astype(layer.dtype))
                for li, layer in enumerate(dev_layers)
            ]
        return dev_layers, host_pool

    device_k, host_k = one(device_k, host_k)
    device_v, host_v = one(device_v, host_v)
    return device_k, host_k, device_v, host_v
