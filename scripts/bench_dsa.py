"""Chip benchmark: DSA sparse decode attention vs dense at long context.

DeepSeek-V3.2 shapes (scaled to one chip): batch 32, 16 heads, latent 512+64,
seq 8192, indexer top-2048.  Sparse reads K latents per token instead of seq —
the long-context decode win.  Includes the indexer scoring cost (idx_dim=128
scan over the full sequence).  Scan-marginal timing; device-generated arrays.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _bench_scanned
from sgl_kernel_npu_tpu.ops.attention.decode_attention import (
    decode_mla,
    decode_mla_sparse,
)
from sgl_kernel_npu_tpu.ops.attention.lightning_indexer import lightning_indexer


def main():
    b, hq, lat, rope = 32, 16, 512, 64
    seq, page, k = 8192, 128, 2048
    idx_heads, idx_dim = 8, 128
    max_pages = seq // page
    n_pages = b * max_pages + 1
    rng = np.random.default_rng(0)

    mk = jax.jit(lambda key, s, d: jax.random.normal(key, s, d) * 0.5,
                 static_argnums=(1, 2))
    kn = mk(jax.random.key(0), (n_pages, 1, page, lat), jnp.bfloat16)
    kr = mk(jax.random.key(1), (n_pages, 1, rope, page), jnp.bfloat16)
    kidx = mk(jax.random.key(2), (n_pages, 1, page, idx_dim), jnp.bfloat16)
    bt = jnp.asarray(
        rng.permutation(n_pages - 1)[: b * max_pages].reshape(b, max_pages) + 1,
        jnp.int32)
    sl = jnp.full((b,), seq, jnp.int32)
    widx = jnp.asarray(rng.standard_normal((b, idx_heads)), jnp.float32)

    n1, n2 = 4, 24
    qs_small = mk(jax.random.key(3), (n1, b, hq, lat + rope), jnp.bfloat16)
    qs_big = mk(jax.random.key(4), (n2, b, hq, lat + rope), jnp.bfloat16)

    from sgl_kernel_npu_tpu.ops.attention.decode_attention import (
        decode_mla_block_sparse)
    from sgl_kernel_npu_tpu.ops.attention.lightning_indexer import (
        lightning_indexer_scores_decode)

    def token_sparse(q, kn_, kr_, ki_, bt_, sl_):
        # exact token top-k (reference semantics) — XLA token gathers
        qi = q[:, :idx_heads, :idx_dim].astype(jnp.bfloat16)
        sel = lightning_indexer(qi[:, None], ki_, widx[:, None], None, sl_, bt_,
                                sparse_count=k)
        return decode_mla_sparse(q, kn_, kr_, sl_, 0.042, bt_,
                                 sel.reshape(b, k))

    def page_sparse(q, kn_, kr_, ki_, bt_, sl_):
        # page top-k through the dense Pallas kernel with a pruned block table
        qi = q[:, :idx_heads, :idx_dim].astype(jnp.bfloat16)
        scores = lightning_indexer_scores_decode(qi, ki_, widx, sl_, bt_)
        return decode_mla_block_sparse(q, kn_, kr_, sl_, 0.042, bt_, scores,
                                       k // page)

    t_token = _bench_scanned(token_sparse, qs_small, qs_big, (kn, kr, kidx, bt, sl))
    t_page = _bench_scanned(page_sparse, qs_small, qs_big, (kn, kr, kidx, bt, sl))
    t_dense = _bench_scanned(
        lambda q, kn_, kr_, ki_, bt_, sl_: decode_mla(q, kn_, kr_, sl_, 0.042, bt_),
        qs_small, qs_big, (kn, kr, kidx, bt, sl))

    dense_bytes = b * seq * (lat + rope) * 2
    sparse_bytes = b * (k * (lat + rope) * 2 + seq * idx_dim * 2)
    print(f"dense  decode_mla:               {t_dense*1e6:8.1f} us "
          f"({dense_bytes/t_dense/1e9:5.0f} GB/s KV)")
    print(f"DSA page top-k (pruned kernel):  {t_page*1e6:8.1f} us "
          f"({sparse_bytes/t_page/1e9:5.0f} GB/s useful) "
          f"-> {t_dense/t_page:.2f}x vs dense")
    print(f"DSA token top-k (XLA gathers):   {t_token*1e6:8.1f} us "
          f"-> {t_dense/t_token:.2f}x vs dense")
    print(f"seq={seq}, K={k} ({k // page} pages)")


if __name__ == "__main__":
    main()
