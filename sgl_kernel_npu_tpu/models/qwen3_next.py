"""Qwen3-Next-style gated-delta-rule (GDN) hybrid layer.

Second model family: exercises the FLA pipeline end to end the way SGLang consumes
the reference's fla/ + mamba/ kernels for Qwen3-Next (SURVEY.md §2.3): causal
conv1d on the mixed qkv stream → gated delta rule (chunked prefill / fused
recurrent decode over state pools) → gated RMSNorm → output projection, plus a
SwiGLU MLP block.

Prefill and decode share one weight pytree; decode carries (conv_state, ssm_state)
pools indexed per request (continuous batching).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from sgl_kernel_npu_tpu.ops.fla.chunk import chunk_gated_delta_rule
from sgl_kernel_npu_tpu.ops.fla.gating import fused_gdn_gating
from sgl_kernel_npu_tpu.ops.fla.norms import layernorm_gated
from sgl_kernel_npu_tpu.ops.fla.recurrent import fused_sigmoid_gating_delta_rule_update
from sgl_kernel_npu_tpu.ops.mamba.causal_conv1d import causal_conv1d_fn, causal_conv1d_update
from sgl_kernel_npu_tpu.ops.norm import rms_norm_ref


@dataclasses.dataclass(frozen=True)
class Qwen3NextConfig:
    hidden: int = 256
    num_k_heads: int = 2        # H (q/k heads)
    num_v_heads: int = 4        # HV
    head_k_dim: int = 32        # K
    head_v_dim: int = 32        # V
    conv_width: int = 4
    mlp_intermediate: int = 512
    chunk_size: int = 16

    @property
    def qkv_dim(self):
        # mixed projection: q (H·K) ‖ k (H·K) ‖ v (HV·V)
        return 2 * self.num_k_heads * self.head_k_dim + self.num_v_heads * self.head_v_dim


def init_weights(key, cfg: Qwen3NextConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 16))

    def rnd(*shape, scale=None):
        s = scale if scale is not None else 1.0 / (shape[0] ** 0.5)
        return (jax.random.normal(next(keys), shape) * s).astype(dtype)

    hv = cfg.num_v_heads
    return {
        "ln1": jnp.ones((cfg.hidden,), dtype),
        "w_qkvz": rnd(cfg.hidden, cfg.qkv_dim + hv * cfg.head_v_dim),  # +z gate
        "w_ba": rnd(cfg.hidden, 2 * hv),                                # b, a gates
        "conv_w": rnd(cfg.qkv_dim, cfg.conv_width, scale=1.0),
        "conv_b": jnp.zeros((cfg.qkv_dim,), dtype),
        "A_log": jnp.asarray(jax.random.uniform(next(keys), (hv,), minval=-2.0, maxval=0.0), dtype),
        "dt_bias": jnp.zeros((hv,), dtype),
        "gn_w": jnp.ones((hv * cfg.head_v_dim,), dtype),
        "w_out": rnd(hv * cfg.head_v_dim, cfg.hidden),
        "ln2": jnp.ones((cfg.hidden,), dtype),
        "w_gate_up": rnd(cfg.hidden, 2 * cfg.mlp_intermediate),
        "w_down": rnd(cfg.mlp_intermediate, cfg.hidden),
    }


def _project(cfg, w, x_flat):
    h1 = rms_norm_ref(x_flat, w["ln1"])
    qkvz = h1 @ w["w_qkvz"]
    ba = h1 @ w["w_ba"]
    qkv = qkvz[:, : cfg.qkv_dim]
    z = qkvz[:, cfg.qkv_dim :]
    b, a = jnp.split(ba, 2, axis=-1)
    return qkv, z, b, a


def _split_heads(cfg, qkv):
    hk = cfg.num_k_heads * cfg.head_k_dim
    q = qkv[..., :hk]
    k = qkv[..., hk : 2 * hk]
    v = qkv[..., 2 * hk :]
    n = qkv.shape[0]
    return (
        q.reshape(n, cfg.num_k_heads, cfg.head_k_dim),
        k.reshape(n, cfg.num_k_heads, cfg.head_k_dim),
        v.reshape(n, cfg.num_v_heads, cfg.head_v_dim),
    )


def _finish(cfg, w, core_out, z, x):
    n = core_out.shape[0]
    o = layernorm_gated(
        core_out.reshape(n, -1), w["gn_w"], None, z,
        group_size=cfg.head_v_dim, norm_before_gate=True, is_rms_norm=True,
    )
    x = x + o @ w["w_out"]
    h2 = rms_norm_ref(x, w["ln2"])
    gu = h2 @ w["w_gate_up"]
    g, u = jnp.split(gu, 2, axis=-1)
    return x + (g * jax.nn.sigmoid(g) * u) @ w["w_down"]


def prefill(cfg: Qwen3NextConfig, w: dict, x: jax.Array):
    """[B, S, hidden] → ([B, S, hidden], conv_state [B, qkv, W-1], ssm_state
    [B, HV, K, V]) — chunked GDN path."""
    bsz, s, _ = x.shape
    flat = x.reshape(bsz * s, -1)
    qkv, z, b, a = _project(cfg, w, flat)
    qkv_seq = qkv.reshape(bsz, s, -1).swapaxes(1, 2)        # [B, qkv, S]
    conv_out, conv_state = causal_conv1d_fn(
        qkv_seq, w["conv_w"], w["conv_b"], return_final_states=True, activation="silu"
    )
    qkv = conv_out.swapaxes(1, 2).reshape(bsz * s, -1)
    q, k, v = _split_heads(cfg, qkv)
    g, beta = fused_gdn_gating(
        w["A_log"], a.reshape(bsz, s, -1), b.reshape(bsz, s, -1), w["dt_bias"]
    )
    o, ssm_state = chunk_gated_delta_rule(
        q.reshape(bsz, s, cfg.num_k_heads, -1),
        k.reshape(bsz, s, cfg.num_k_heads, -1),
        v.reshape(bsz, s, cfg.num_v_heads, -1),
        g, beta,
        chunk_size=cfg.chunk_size, use_qk_l2norm_in_kernel=True,
    )
    out = _finish(cfg, w, o.reshape(bsz * s, cfg.num_v_heads, -1), z, flat)
    return out.reshape(bsz, s, -1), conv_state, ssm_state


def decode_step(cfg: Qwen3NextConfig, w: dict, x: jax.Array, conv_pool, ssm_pool, state_indices):
    """Single-token decode over state pools.  x [B, hidden]."""
    qkv, z, b, a = _project(cfg, w, x)
    qkv_tok, conv_pool = causal_conv1d_update(
        qkv, conv_pool, w["conv_w"], w["conv_b"], activation="silu",
        conv_state_indices=state_indices,
    )
    q, k, v = _split_heads(cfg, qkv_tok)
    o, ssm_pool = fused_sigmoid_gating_delta_rule_update(
        w["A_log"], a[:, None, :], w["dt_bias"],
        q[:, None], k[:, None], v[:, None], b[:, None, :],
        ssm_pool, state_indices, use_qk_l2norm_in_kernel=True,
    )
    out = _finish(cfg, w, o[:, 0], z, x)
    return out, conv_pool, ssm_pool
