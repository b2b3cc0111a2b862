"""Flash-linear-attention: gated delta rule (Qwen3-Next / GDN) pipeline."""

from sgl_kernel_npu_tpu.ops.fla.chunk import (
    chunk_gated_delta_rule,
    chunk_gated_delta_rule_ref,
    l2norm,
)
from sgl_kernel_npu_tpu.ops.fla.gating import fused_gdn_gating
from sgl_kernel_npu_tpu.ops.fla.norms import layernorm_gated
from sgl_kernel_npu_tpu.ops.fla.recurrent import fused_sigmoid_gating_delta_rule_update

__all__ = [
    "chunk_gated_delta_rule",
    "chunk_gated_delta_rule_ref",
    "l2norm",
    "fused_gdn_gating",
    "layernorm_gated",
    "fused_sigmoid_gating_delta_rule_update",
]
