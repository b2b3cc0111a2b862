"""sgl_kernel_npu_tpu — a TPU-native kernel + expert-parallel communication library.

Built from scratch in JAX / XLA / Pallas with the capability surface of SGLang's
Ascend NPU kernel library (``sgl-kernel-npu``):

- ``ops``       — single-chip inference kernels (attention, norms, activations,
                  quantization, LoRA, FLA, Mamba conv, speculative decoding,
                  KV-cache management).  Pallas kernels with pure-JAX reference
                  ("golden") twins for testing.
- ``parallel``  — DeepEP-equivalent expert-parallel all-to-all over a
                  ``jax.sharding.Mesh`` (normal/prefill and low-latency/decode
                  modes, INT8 dispatch + BF16 combine, fused MoE).
- ``models``    — model-family layers wiring the kernels together
                  (DeepSeek-V3-style MLA + MoE decode, Qwen3-Next GDN).
- ``utils``     — benchmarking, diagnostics, memory-saver analogue.

Unlike the reference (which registers C++/AscendC ops into torch), everything
here is a plain jittable function: ``jax.jit`` tracing is the registration
layer, ``shard_map`` over a device mesh is the communication runtime.
"""

__version__ = "0.1.0"


def version() -> str:
    """Library version (reference: csrc/pytorch_extensions.cpp:22 `sgl_kernel_npu_version`)."""
    return __version__
