"""Continuous-batching serving engine over the native radix cache.

The reference is a kernel library whose consumer (SGLang) supplies the serving
runtime; this module supplies the TPU-native equivalent so the framework is
usable end-to-end: request admission → radix prefix reuse (C++ cache manager,
csrc/cache_manager.cpp) → chunked varlen prefill → batched paged decode →
refcounted release, all with static shapes (every jit signature is fixed by the
engine's capacity knobs, so steady-state serving never recompiles).

Model-agnostic: the engine drives a :class:`ModelAdapter`; `llama_adapter`
wires models/llama.py (GPT-OSS or DeepSeek adapters follow the same shape).

Radix refcount protocol (single-threaded engine; see csrc/cache_manager.cpp):
  admit     — match(prompt[:-1]) holds the shared prefix; allocate private tail
  prompt done — insert(span, ref=0) then one match(span) = exactly one hold per
              chunk; duplicates beyond the admit prefix were raced-in by an
              identical in-flight prompt: remap to canonical pages, free ours
  finish    — release(span); free private (uncached) pages
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from sgl_kernel_npu_tpu.runtime.cache_manager import RadixCacheManager


@dataclasses.dataclass
class ModelAdapter:
    """Static-shape callables the engine drives (all jit-able).

    ``state_idx`` threads recurrent state-pool slots (GDN/Mamba hybrids); pure
    paged-KV adapters ignore it.  ``init_cache`` receives ``state_slots`` =
    max concurrent requests (+1 headroom) for pool sizing.
    """

    page_size: int
    embed: Callable            # ids [N] → hidden [N, H]
    lm_head: Callable          # hidden [N, H] → logits [N, V]
    prefill_step: Callable     # (x, seq_lens, caches, bt, ctx, slots, state_idx, lora_idx) → (h, caches)
    decode_step: Callable      # (x, pos, caches, bt, ctx, slots, state_idx, lora_idx) → (h, caches)
    init_cache: Callable       # (num_pages, state_slots) → caches
    # recurrent-state rollback hooks (hybrid/GDN models; None for paged-KV):
    # snapshot_state(caches, state_idx [B]) → snap;
    # restore_state(caches, snap, state_idx) → caches
    snapshot_state: Callable | None = None
    restore_state: Callable | None = None
    # True if prefill_step handles only ONE request per call (GDN recurrence)
    prefill_single: bool = False
    # host-offload hooks (L2 KV tier): gather_pages(caches, ids [n]) → one
    # array [n, ...] holding every layer's KV for those pages;
    # scatter_pages(caches, ids, payload) → caches
    gather_pages: Callable | None = None
    scatter_pages: Callable | None = None


def paged_gather_pages(caches, page_ids):
    """Generic host-offload gather for any cache pytree whose leaves lead with
    a page dimension (llama/gpt_oss tuples, deepseek nope/rope/kidx dicts)."""
    return jax.tree.map(lambda a: a[page_ids], caches)


def paged_scatter_pages(caches, page_ids, payload):
    return jax.tree.map(
        lambda a, p: a.at[page_ids].set(p.astype(a.dtype)), caches, payload)


def llama_adapter(cfg, params, dtype=jnp.float32, lora: dict | None = None,
                  weights_q: dict | None = None) -> ModelAdapter:
    """``lora``: optional multi-adapter weights (models.llama.init_lora);
    requests select adapters via ``Engine.add_request(lora_id=…)``.
    ``weights_q`` (models.llama.quantize_weights) serves W8A8."""
    from sgl_kernel_npu_tpu.models import llama as m

    return ModelAdapter(
        page_size=cfg.page_size,
        embed=lambda ids: m.embed(params, ids),
        lm_head=lambda x: m.lm_head(params, x),
        prefill_step=lambda x, sl, c, bt, ctx, slots, si, li: m.prefill_step(
            cfg, params, x, sl, c, bt, ctx, slots, max_q=x.shape[0],
            lora=lora, lora_idx=li, weights_q=weights_q),
        decode_step=lambda x, pos, c, bt, ctx, slots, si, li: m.decode_step(
            cfg, params, x, pos, c, bt, ctx, slots, lora=lora, lora_idx=li,
            weights_q=weights_q),
        init_cache=lambda n, s_: m.init_kv_cache(cfg, n, dtype),
        gather_pages=paged_gather_pages,
        scatter_pages=paged_scatter_pages,
    )


def llama_cp_adapter(cfg, params, mesh, dtype=jnp.float32,
                     axis_name: str = "cp") -> ModelAdapter:
    """Context-parallel serving configuration: prefill runs ring attention
    over the ``axis_name`` axis of ``mesh`` (sequence sharded, K/V rotated via
    ppermute — parallel.ring_attention), decode runs the normal paged path.

    CP replaces chunked prefill for long prompts, so build the Engine with
    ``prefill_chunk >= max prompt length`` and divisible by the ring size;
    ``models.llama.prefill_step_cp`` documents the restriction."""
    from sgl_kernel_npu_tpu.models import llama as m

    return ModelAdapter(
        page_size=cfg.page_size,
        embed=lambda ids: m.embed(params, ids),
        lm_head=lambda x: m.lm_head(params, x),
        prefill_step=lambda x, sl, c, bt, ctx, slots, si, li: m.prefill_step_cp(
            cfg, params, x, sl, c, bt, ctx, slots, mesh=mesh,
            axis_name=axis_name),
        decode_step=lambda x, pos, c, bt, ctx, slots, si, li: m.decode_step(
            cfg, params, x, pos, c, bt, ctx, slots),
        init_cache=lambda n, s_: m.init_kv_cache(cfg, n, dtype),
        gather_pages=paged_gather_pages,
        scatter_pages=paged_scatter_pages,
    )


def llama_pp_adapter(cfg, params, mesh, dtype=jnp.float32,
                     axis_name: str = "pp") -> ModelAdapter:
    """Pipeline-parallel serving configuration: the layer stack is split into
    ``mesh.shape[axis_name]`` stages; each rank owns one stage's weights and
    KV slice, and decode/prefill flow through the stage ring
    (models.llama_pp — ppermute stage scan; parallel.pipeline supplies the
    GPipe microbatch overlap for training)."""
    from sgl_kernel_npu_tpu.models import llama_pp as mp

    num_stages = mesh.shape[axis_name]
    pp_params = mp.stack_stage_params(cfg, params, num_stages)

    def _embed_lm():
        from sgl_kernel_npu_tpu.models import llama as m
        return (lambda ids: m.embed(params, ids),
                lambda x: m.lm_head(params, x))

    embed, lm_head = _embed_lm()
    return ModelAdapter(
        page_size=cfg.page_size,
        embed=embed,
        lm_head=lm_head,
        prefill_step=lambda x, sl, c, bt, ctx, slots, si, li: mp.prefill_step_pp(
            cfg, pp_params, x, sl, c, bt, ctx, slots, mesh=mesh,
            axis_name=axis_name),
        decode_step=lambda x, pos, c, bt, ctx, slots, si, li: mp.decode_step_pp(
            cfg, pp_params, x, pos, c, bt, ctx, slots, mesh=mesh,
            axis_name=axis_name),
        init_cache=lambda n, s_: mp.init_kv_cache_pp(cfg, n, num_stages, dtype),
    )


def gpt_oss_adapter(cfg, params, dtype=jnp.float32,
                    weights_q: dict | None = None,
                    ep_buffer=None) -> ModelAdapter:
    """``weights_q`` (models.gpt_oss.quantize_weights) serves W8A8;
    ``ep_buffer`` (a mesh-bound parallel.Buffer built for cfg.num_experts)
    serves the MoE expert-parallel through ``Buffer.fused_oai_moe``."""
    from sgl_kernel_npu_tpu.models import gpt_oss as m

    return ModelAdapter(
        page_size=cfg.page_size,
        embed=lambda ids: m.embed(params, ids),
        lm_head=lambda x: m.lm_head(params, x),
        prefill_step=lambda x, sl, c, bt, ctx, slots, si, li: m.prefill_step(
            cfg, params, x, sl, c, bt, ctx, slots, max_q=x.shape[0],
            weights_q=weights_q, ep_buffer=ep_buffer),
        decode_step=lambda x, pos, c, bt, ctx, slots, si, li: m.decode_step(
            cfg, params, x, pos, c, bt, ctx, slots, weights_q=weights_q,
            ep_buffer=ep_buffer),
        init_cache=lambda n, s_: m.init_kv_cache(cfg, n, dtype),
        gather_pages=paged_gather_pages,
        scatter_pages=paged_scatter_pages,
    )


def deepseek_adapter(cfg, params, dtype=jnp.float32, *,
                     moe_weights_q=None, ep_buffer=None,
                     mla_wq=None, eplb_tables=None) -> ModelAdapter:
    """``moe_weights_q`` (models.deepseek_v3.quantize_moe_weights) switches
    decode to the W8A8 grouped MoE; adding ``ep_buffer`` (a mesh-bound
    parallel.Buffer) runs it expert-parallel through fused_deep_moe — the
    engine then serves with EP-sharded expert weights.  ``mla_wq``
    (models.deepseek_v3.make_mla_preprocess_weights) runs the fused W8A8
    mla_preprocess prologue on both prefill and decode.  ``eplb_tables``
    (parallel.eplb.make_remap_tables) serves an EPLB placement: pass
    physically-gathered ``moe_weights_q`` and a Buffer built for the physical
    expert count."""
    from sgl_kernel_npu_tpu.models import deepseek_v3 as m

    return ModelAdapter(
        page_size=cfg.page_size,
        embed=lambda ids: m.embed(params, ids),
        lm_head=lambda x: m.lm_head(params, x),
        prefill_step=lambda x, sl, c, bt, ctx, slots, si, li: m.prefill_step(
            cfg, params, x, sl, c, bt, ctx, slots, max_q=x.shape[0],
            mla_wq=mla_wq, moe_weights_q=moe_weights_q, ep_buffer=ep_buffer,
            eplb_tables=eplb_tables),
        decode_step=lambda x, pos, c, bt, ctx, slots, si, li: m.decode_step(
            cfg, params, x, pos, c, bt, ctx, slots,
            moe_weights_q=moe_weights_q, ep_buffer=ep_buffer, mla_wq=mla_wq,
            eplb_tables=eplb_tables),
        init_cache=lambda n, s_: m.init_kv_cache(cfg, n, dtype),
        gather_pages=paged_gather_pages,
        scatter_pages=paged_scatter_pages,
    )


def qwen3_hybrid_adapter(cfg, params, dtype=jnp.float32,
                         weights_q: dict | None = None,
                         moe_weights_q: list | None = None,
                         ep_buffer=None) -> ModelAdapter:
    """Qwen3-Next hybrid: GDN state pools + paged KV, both engine-threaded.
    ``weights_q`` (models.qwen3_next.quantize_hybrid_weights) serves W8A8;
    ``moe_weights_q`` (quantize_hybrid_moe_weights) + ``ep_buffer`` serve the
    routed experts expert-parallel via ``Buffer.fused_deep_moe``."""
    from sgl_kernel_npu_tpu.models import qwen3_next as m

    return ModelAdapter(
        page_size=cfg.page_size,
        embed=lambda ids: m.hybrid_embed(params, ids),
        lm_head=lambda x: m.hybrid_lm_head(params, x),
        prefill_step=lambda x, sl, c, bt, ctx, slots, si, li: m.hybrid_prefill_step(
            cfg, params, x, sl, c, bt, ctx, slots, si, max_q=x.shape[0],
            weights_q=weights_q, moe_weights_q=moe_weights_q,
            ep_buffer=ep_buffer),
        decode_step=lambda x, pos, c, bt, ctx, slots, si, li: m.hybrid_decode_step(
            cfg, params, x, pos, c, bt, ctx, slots, si, weights_q=weights_q,
            moe_weights_q=moe_weights_q, ep_buffer=ep_buffer),
        init_cache=lambda n, s_: m.init_hybrid_cache(cfg, n, s_, dtype),
        snapshot_state=lambda c, si: m.hybrid_state_snapshot(cfg, c, si),
        restore_state=lambda c, snap, si: m.hybrid_state_restore(cfg, c, snap, si),
        prefill_single=True,
    )


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Per-request sampling (ops/sampling.py).  ``temperature=0`` = greedy;
    filters compose top-k → top-p → min-p; deterministic in (seed, step)."""

    temperature: float = 0.0
    top_k: int = 0          # <= 0: off
    top_p: float = 1.0      # >= 1: off
    min_p: float = 0.0      # <= 0: off
    seed: int = 0
    # occurrence penalties over prompt+generated tokens (HF/OpenAI semantics)
    repetition_penalty: float = 1.0   # 1 = off
    presence_penalty: float = 0.0     # 0 = off
    frequency_penalty: float = 0.0    # 0 = off

    @property
    def needs_counts(self) -> bool:
        return (self.repetition_penalty != 1.0 or self.presence_penalty != 0.0
                or self.frequency_penalty != 0.0)


@dataclasses.dataclass
class _Request:
    rid: int
    prompt: np.ndarray            # int32 token ids
    max_new_tokens: int
    pages: list = dataclasses.field(default_factory=list)   # block table (physical)
    pos: int = 0                  # tokens whose KV is in the cache
    state_slot: int = -1          # recurrent state-pool slot (hybrid models)
    lora_id: int = 0              # LoRA adapter id (0 = none)
    sampling: "SamplingParams | None" = None   # None = greedy
    stop_tokens: frozenset = frozenset()       # finish early on any of these
    want_logprobs: bool = False
    out_logprobs: list = dataclasses.field(default_factory=list)
    tok_counts: "np.ndarray | None" = None     # [V] occurrence counts (penalties)
    admit_matched: int = 0        # tokens held via the admit-time match
    inserted_span: int = 0        # tokens held via the post-prefill insert
    out_tokens: list = dataclasses.field(default_factory=list)
    done: bool = False

    @property
    def prompt_len(self) -> int:
        return len(self.prompt)

    def token_at(self, i: int) -> int:
        """Full sequence view: prompt then generated tokens."""
        return int(self.prompt[i]) if i < self.prompt_len else self.out_tokens[
            i - self.prompt_len]


class HostKVPool:
    """Shared page-major host KV pool + radix index.

    Standalone so SEVERAL engines over the same model can attach to one pool —
    which is prefill/decode **disaggregation**: a prefill engine offloads each
    finished prompt's pages here, and a decode engine admission-matches the
    same prompt, restores the prefix from the pool, and serves decode without
    recomputing prefill.  This is the serving role the reference's
    ``transfer_kv_dim_exchange`` plays for sglang's PD separation
    (csrc/transfer_kv_dim_exchange/op_host: device↔host KV migration in the
    page-major exchange layout).  On one host the hand-off is a memcpy; across
    hosts the page-major numpy payload is the wire format (DCN/RPC transport
    is deployment plumbing, not framework code).
    """

    def __init__(self, num_pages: int, page_size: int):
        self.cm = RadixCacheManager(num_pages, page_size)
        self.pool = None              # numpy pytree, shaped on first offload
        self.page = page_size


class Engine:
    """Continuous-batching engine: `add_request` then `step` until drained."""

    def __init__(self, adapter: ModelAdapter, num_pages: int, *,
                 max_batch: int = 8, max_pages_per_req: int = 16,
                 prefill_chunk: int = 64, mixed: bool = True,
                 spec_k: int = 0, draft_adapter: ModelAdapter | None = None,
                 spec_tree_width: int = 1,
                 host_pool_pages: int = 0,
                 host_pool: HostKVPool | None = None):
        self.a = adapter
        self.page = adapter.page_size
        self.cm = RadixCacheManager(num_pages, self.page)
        self.caches = adapter.init_cache(num_pages, max_batch + 1)
        self._free_state_slots = list(range(max_batch))
        self.max_batch = max_batch
        self.max_pages_per_req = max_pages_per_req
        self.prefill_chunk = prefill_chunk
        self.mixed = mixed
        self.waiting: deque[_Request] = deque()
        self.running: list[_Request] = []
        self.finished: dict[int, list[int]] = {}
        self.logprobs: dict[int, list[float]] = {}
        self.stats = {"prefill_tokens": 0, "decode_steps": 0, "cached_tokens": 0,
                      "spec_rounds": 0, "spec_accepted": 0,
                      "host_offloaded_pages": 0, "host_restored_tokens": 0}
        # --- L2 host KV tier (hierarchical cache) ---
        # finished prompts' pages offload (device→host) into a SECOND radix
        # cache indexing a page-major host pool (the reference's
        # transfer_kv_dim_exchange layout); admission checks host after device
        # and restores the longer prefix.  The same C++ radix core runs both
        # tiers.
        self._host = host_pool
        if host_pool_pages > 0 and self._host is None:
            self._host = HostKVPool(host_pool_pages, self.page)
        if self._host is not None:
            if adapter.gather_pages is None:
                raise ValueError("adapter lacks gather/scatter_pages hooks")
            if draft_adapter is not None:
                raise ValueError("host KV tier + speculative decoding is not "
                                 "supported (the draft pool is not offloaded)")
            if self._host.page != self.page:
                raise ValueError("host pool page size != engine page size")
            self._jit_gather = jax.jit(adapter.gather_pages)
            self._jit_scatter = jax.jit(adapter.scatter_pages,
                                        donate_argnums=(0,))
        self._next_rid = 0
        # caches are donated: the engine's KV pool updates in place
        self._jit_prefill = jax.jit(self._prefill_call, donate_argnums=(2,))
        self._jit_decode = jax.jit(self._decode_call, donate_argnums=(2,))
        self._jit_decode_sampled = jax.jit(self._decode_call_sampled,
                                           donate_argnums=(2,))
        # --- speculative decoding (EAGLE-chain style; paged-KV adapters) ---
        # The draft model shares the target's page geometry, so one block table
        # and slot mapping drive both KV pools.  Rejected tokens need no
        # rollback: their stale cache rows sit beyond every later context
        # length until the position is re-written (reference csrc/build_tree +
        # sample/verify_tree_greedy.py supply only the ops; the loop is ours).
        self.spec_k = spec_k
        self.draft = draft_adapter
        if spec_k > 0 and draft_adapter is None:
            raise ValueError("spec_k > 0 requires a draft_adapter")
        if draft_adapter is not None:
            if spec_k <= 0:
                raise ValueError("spec_k must be > 0 with a draft_adapter")
            if draft_adapter.page_size != adapter.page_size:
                raise ValueError("draft/target page_size mismatch")
            self.draft_caches = draft_adapter.init_cache(num_pages, max_batch + 1)
            self._jit_draft_prefill = jax.jit(
                self._draft_prefill_call, donate_argnums=(2,))
            self._jit_draft_decode = jax.jit(
                self._draft_decode_call, donate_argnums=(2,))
            if draft_adapter.snapshot_state is not None:
                raise ValueError("draft adapters must be paged-KV (no "
                                 "recurrent state): stale draft state cannot "
                                 "be rolled back across rounds")
            self._jit_verify = jax.jit(self._verify_call, donate_argnums=(2,))
            if adapter.prefill_single or adapter.snapshot_state is not None:
                self._jit_verify_one = jax.jit(self._verify_one_call,
                                               donate_argnums=(2,))
            if adapter.snapshot_state is not None:
                self._jit_snapshot = jax.jit(adapter.snapshot_state)
                self._jit_restore = jax.jit(adapter.restore_state,
                                            donate_argnums=(0,))
            from sgl_kernel_npu_tpu.ops import speculative as _sp
            self._jit_verify_tree = jax.jit(_sp.verify_tree_greedy)
        # --- TREE speculative decoding (branch top-B at the root, chain the
        # rest; copy-on-write suffix pages give each path its own causal
        # chain, so the existing varlen verify works unchanged) ---
        self.spec_width = spec_tree_width
        if spec_tree_width > 1:
            if draft_adapter is None:
                raise ValueError("spec_tree_width > 1 requires a draft_adapter")
            if adapter.snapshot_state is not None or adapter.prefill_single:
                raise ValueError("tree speculation needs a paged-KV target "
                                 "(no recurrent state / single-prefill)")
            if spec_tree_width > max_batch:
                raise ValueError("spec_tree_width must be <= max_batch")

            def _topb(ids, pos, caches, bt, ctx, slots, state_idx, lora_idx):
                x = draft_adapter.embed(ids)
                h, caches = draft_adapter.decode_step(
                    x, pos, caches, bt, ctx, slots, state_idx, lora_idx)
                _, top = jax.lax.top_k(draft_adapter.lm_head(h),
                                       spec_tree_width)
                return top.astype(jnp.int32), caches

            self._jit_draft_topb = jax.jit(_topb, donate_argnums=(2,))
            self._jit_copy_pages = jax.jit(
                lambda c, src, dst: jax.tree.map(
                    lambda a: a.at[dst].set(a[src]), c),
                donate_argnums=(0,))

    # ---------------- public API ----------------

    @property
    def host_cm(self):
        """Radix index of the attached host tier (None = no L2 tier)."""
        return self._host.cm if self._host is not None else None

    @property
    def host_pool(self):
        return self._host.pool if self._host is not None else None

    @host_pool.setter
    def host_pool(self, v):
        self._host.pool = v

    def add_request(self, prompt, max_new_tokens: int, lora_id: int = 0,
                    sampling: SamplingParams | None = None,
                    stop_tokens=(), logprobs: bool = False) -> int:
        if sampling is not None and sampling.temperature > 0 and self.spec_k:
            raise ValueError("sampled requests are not supported with "
                             "speculative decoding (greedy tree verify)")
        if logprobs and self.spec_k:
            raise ValueError("logprobs are not recorded on the speculative "
                             "path (tokens emerge from the tree verify)")
        rid = self._next_rid
        self._next_rid += 1
        self.waiting.append(_Request(rid, np.asarray(prompt, np.int32),
                                     max_new_tokens, lora_id=lora_id,
                                     sampling=sampling, want_logprobs=logprobs,
                                     stop_tokens=frozenset(int(t) for t in stop_tokens)))
        return rid

    def _append_token(self, r: _Request, tok: int) -> None:
        """Record a generated token + completion checks (length / stop set) +
        occurrence counts for penalty-bearing requests."""
        r.out_tokens.append(tok)
        if r.tok_counts is not None:
            r.tok_counts[tok] += 1
        if len(r.out_tokens) >= r.max_new_tokens or tok in r.stop_tokens:
            r.done = True

    def _ensure_counts(self, r: _Request, vocab: int) -> None:
        if (r.tok_counts is None and r.sampling is not None
                and r.sampling.needs_counts):
            c = np.zeros((vocab,), np.int32)
            np.add.at(c, r.prompt, 1)
            np.add.at(c, np.asarray(r.out_tokens, np.int64), 1)
            r.tok_counts = c

    def run(self, prompts, max_new_tokens: int,
            sampling: SamplingParams | None = None) -> list[list[int]]:
        rids = [self.add_request(p, max_new_tokens, sampling=sampling)
                for p in prompts]
        while self.waiting or self.running:
            self.step()
        return [self.finished[r] for r in rids]

    def step(self) -> None:
        """One scheduling tick.

        ``mixed=True`` (default) interleaves: every step advances ALL
        decode-phase requests by one token AND prefills one chunk of one
        prompt — decoding requests never stall behind a long admission
        (chunked-prefill mixed batching; the two jitted calls pipeline on
        device via donated-cache dataflow).  ``mixed=False`` restores
        prefill-priority serial scheduling."""
        self._admit()
        dec = [r for r in self.running if r.pos >= r.prompt_len]
        pre = [r for r in self.running if r.pos < r.prompt_len]
        if dec and (self.mixed or not pre):
            if self.draft is not None and self.spec_width > 1:
                self._spec_decode_tree(dec)
            elif self.draft is not None:
                self._spec_decode(dec)
            else:
                self._decode(dec)
        if pre:
            self._prefill(pre[0])
        self._retire()

    # ---------------- internals ----------------

    def _admit(self) -> None:
        while self.waiting and len(self.running) < self.max_batch:
            r = self.waiting.popleft()
            # match only up to prompt_len-1: the last prompt token always
            # re-prefills so there is a live row to take logits from
            matched, pages = self.cm.match(r.prompt[: r.prompt_len - 1])
            pages = list(int(p) for p in pages)
            if self.host_cm is not None and matched < r.prompt_len - 1:
                matched, pages = self._host_restore(r, matched, pages)
            r.admit_matched = matched
            r.pages = pages
            r.pos = matched
            r.state_slot = self._free_state_slots.pop()
            self.stats["cached_tokens"] += matched
            self.running.append(r)

    def _host_restore(self, r: _Request, matched: int, pages: list):
        """Extend a device-radix miss from the host tier: upload the host
        pool's longer prefix into freshly-allocated device pages and register
        it in the device radix (so refcounting and sharing work as if it had
        been prefetched)."""
        hm, hpages = self.host_cm.match(r.prompt[: r.prompt_len - 1])
        try:
            if hm <= matched or self.host_pool is None:
                return matched, pages
            s_pg, n_pg = matched // self.page, hm // self.page
            new_dev = self.cm.alloc(n_pg - s_pg)
            if len(new_dev) < n_pg - s_pg:
                self.cm.free(np.asarray(new_dev, np.int32))
                return matched, pages
            sel = np.asarray(hpages)[s_pg:n_pg]
            payload = jax.tree.map(lambda pool: jnp.asarray(pool[sel]),
                                   self.host_pool)
            self.caches = self._jit_scatter(
                self.caches, jnp.asarray(new_dev, jnp.int32), payload)
            allp = pages + [int(p) for p in new_dev]
            _, dup = self.cm.insert(r.prompt[:hm], np.asarray(allp, np.int32),
                                    ref=0)
            m2, canon = self.cm.match(r.prompt[:hm])   # the long-term hold
            if matched:
                self.cm.release(r.prompt[:matched])    # swap the short hold
            if len(dup) > s_pg:
                self.cm.free(np.asarray(dup[s_pg:], np.int32))
            self.stats["host_restored_tokens"] += m2 - matched
            return m2, [int(p) for p in canon]
        finally:
            if hm:
                self.host_cm.release(r.prompt[:hm])

    def _host_offload(self, r: _Request) -> None:
        """Copy a finished prompt's cached span into the host pool (device →
        page-major host, the transfer_kv_dim_exchange layout) and index it in
        the host radix (ref=0: the L2 tier is best-effort, LRU-evictable)."""
        span = r.inserted_span
        if not span:
            return
        npg = span // self.page
        have, hpages = self.host_cm.match(r.prompt[:span])
        try:
            h_pg = have // self.page
            if h_pg >= npg:
                return
            got = self.host_cm.alloc(npg - h_pg)
            if len(got) < npg - h_pg:
                self.host_cm.free(np.asarray(got, np.int32))
                return
            payload = jax.tree.map(np.asarray, self._jit_gather(
                self.caches, jnp.asarray(r.pages[h_pg:npg], jnp.int32)))
            if self.host_pool is None:
                n_host = self.host_cm.num_pages
                self.host_pool = jax.tree.map(
                    lambda a: np.zeros((n_host,) + a.shape[1:], a.dtype), payload)
            for pool, leaf in zip(jax.tree.leaves(self.host_pool),
                                  jax.tree.leaves(payload)):
                pool[got] = leaf
            allp = [int(p) for p in hpages] + [int(p) for p in got]
            _, dup = self.host_cm.insert(r.prompt[:span],
                                         np.asarray(allp, np.int32), ref=0)
            if len(dup) > h_pg:
                self.host_cm.free(np.asarray(dup[h_pg:], np.int32))
            self.stats["host_offloaded_pages"] += npg - h_pg
        finally:
            if have:
                self.host_cm.release(r.prompt[:have])

    def _ensure_pages(self, r: _Request, upto_tokens: int) -> None:
        need = -(-upto_tokens // self.page) - len(r.pages)
        if need > 0:
            got = self.cm.alloc(need)
            if len(got) < need:
                raise RuntimeError("out of KV pages (raise num_pages)")
            r.pages.extend(int(p) for p in got)

    def _slot(self, r: _Request, i: int) -> int:
        return r.pages[i // self.page] * self.page + i % self.page

    def _prefill_call(self, ids, seq_len, caches, bt, ctx, slots, state_idx, lora_idx):
        x = self.a.embed(ids)
        h, caches = self.a.prefill_step(
            x, seq_len[None], caches, bt[None], ctx[None], slots, state_idx, lora_idx)
        return self.a.lm_head(h[seq_len - 1][None])[0], caches

    def _decode_call(self, ids, pos, caches, bt, ctx, slots, state_idx, lora_idx):
        x = self.a.embed(ids)
        h, caches = self.a.decode_step(x, pos, caches, bt, ctx, slots, state_idx,
                                       lora_idx)
        from sgl_kernel_npu_tpu.ops.sampling import token_logprobs
        logits = self.a.lm_head(h)
        toks = jnp.argmax(logits, -1)
        return toks, token_logprobs(logits, toks), caches

    def _decode_call_sampled(self, ids, pos, caches, bt, ctx, slots, state_idx,
                             lora_idx, seeds, steps, temp, tk, tp, mp,
                             counts, rep, pres, freq):
        from sgl_kernel_npu_tpu.ops.sampling import apply_penalties, sample_tokens

        x = self.a.embed(ids)
        h, caches = self.a.decode_step(x, pos, caches, bt, ctx, slots, state_idx,
                                       lora_idx)
        from sgl_kernel_npu_tpu.ops.sampling import token_logprobs

        raw = self.a.lm_head(h)
        logits = apply_penalties(raw, counts, rep, pres, freq)
        toks = sample_tokens(logits, seeds, steps, temp, tk, tp, mp)
        return toks, token_logprobs(raw, toks), caches

    def _pick_token(self, r: _Request, logits) -> int:
        """First generated token (prefill bonus): greedy or sampled."""
        sp = r.sampling
        if sp is None or sp.temperature <= 0:
            return int(np.argmax(np.asarray(logits)))
        from sgl_kernel_npu_tpu.ops.sampling import apply_penalties, sample_tokens

        lg = jnp.asarray(logits)[None]
        self._ensure_counts(r, lg.shape[-1])
        if r.tok_counts is not None:
            lg = apply_penalties(
                lg, jnp.asarray(r.tok_counts)[None],
                jnp.asarray([sp.repetition_penalty], jnp.float32),
                jnp.asarray([sp.presence_penalty], jnp.float32),
                jnp.asarray([sp.frequency_penalty], jnp.float32))
        tok = sample_tokens(
            lg, jnp.asarray([sp.seed], jnp.int32),
            jnp.asarray([len(r.out_tokens)], jnp.int32),
            jnp.asarray([sp.temperature], jnp.float32),
            jnp.asarray([sp.top_k], jnp.int32),
            jnp.asarray([sp.top_p], jnp.float32),
            jnp.asarray([sp.min_p], jnp.float32))
        return int(tok[0])

    def _draft_prefill_call(self, ids, seq_len, caches, bt, ctx, slots,
                            state_idx, lora_idx):
        x = self.draft.embed(ids)
        _, caches = self.draft.prefill_step(
            x, seq_len[None], caches, bt[None], ctx[None], slots, state_idx,
            lora_idx)
        return caches

    def _draft_decode_call(self, ids, pos, caches, bt, ctx, slots, state_idx,
                           lora_idx):
        x = self.draft.embed(ids)
        h, caches = self.draft.decode_step(x, pos, caches, bt, ctx, slots,
                                           state_idx, lora_idx)
        return jnp.argmax(self.draft.lm_head(h), -1).astype(jnp.int32), caches

    def _verify_call(self, ids, seq_lens, caches, bt, ctx, slots, state_idx,
                     lora_idx):
        """Score all requests' [root]+drafts rows in ONE packed varlen prefill
        (a chain tree's attention mask IS the causal mask)."""
        x = self.a.embed(ids)
        h, caches = self.a.prefill_step(x, seq_lens, caches, bt, ctx, slots,
                                        state_idx, lora_idx)
        return jnp.argmax(self.a.lm_head(h), -1).astype(jnp.int32), caches

    def _verify_one_call(self, ids, seq_len, caches, bt, ctx, slots, state_idx,
                         lora_idx):
        """Single-request verify / catch-up prefill (hybrid adapters: GDN
        recurrence is per-request); returns every row's argmax."""
        x = self.a.embed(ids)
        h, caches = self.a.prefill_step(
            x, seq_len[None], caches, bt[None], ctx[None], slots, state_idx,
            lora_idx)
        return jnp.argmax(self.a.lm_head(h), -1).astype(jnp.int32), caches

    def _prefill(self, r: _Request) -> None:
        chunk = min(self.prefill_chunk, r.prompt_len - r.pos)
        self._ensure_pages(r, r.pos + chunk)
        s = self.prefill_chunk                      # static packed width
        ids = np.zeros((s,), np.int32)
        slots = np.full((s,), -1, np.int32)
        ids[:chunk] = r.prompt[r.pos : r.pos + chunk]
        for j in range(chunk):
            slots[j] = self._slot(r, r.pos + j)
        bt = np.zeros((self.max_pages_per_req,), np.int32)
        bt[: len(r.pages)] = r.pages
        logits, self.caches = self._jit_prefill(
            jnp.asarray(ids), jnp.int32(chunk), self.caches,
            jnp.asarray(bt), jnp.int32(r.pos + chunk), jnp.asarray(slots),
            jnp.asarray([r.state_slot], jnp.int32),
            jnp.full((s,), r.lora_id, jnp.int32))
        if self.draft is not None:
            # mirror the chunk into the draft model's KV pool (same pages)
            self.draft_caches = self._jit_draft_prefill(
                jnp.asarray(ids), jnp.int32(chunk), self.draft_caches,
                jnp.asarray(bt), jnp.int32(r.pos + chunk), jnp.asarray(slots),
                jnp.asarray([r.state_slot], jnp.int32),
                jnp.full((s,), r.lora_id, jnp.int32))
        r.pos += chunk
        self.stats["prefill_tokens"] += chunk
        if r.pos == r.prompt_len:
            tok = self._pick_token(r, logits)
            if r.want_logprobs:
                from sgl_kernel_npu_tpu.ops.sampling import token_logprobs
                r.out_logprobs.append(float(token_logprobs(
                    jnp.asarray(logits)[None], jnp.asarray([tok], jnp.int32))[0]))
            self._append_token(r, tok)
            self._share_prefix(r)

    def _share_prefix(self, r: _Request) -> None:
        span = (r.prompt_len // self.page) * self.page
        if span == 0:
            return
        npg = span // self.page
        _, dup = self.cm.insert(r.prompt[:span], np.asarray(r.pages[:npg]), ref=0)
        m2, canon = self.cm.match(r.prompt[:span])     # the single long-term hold
        assert m2 == span
        admit_pages = r.admit_matched // self.page
        for i, p in enumerate(int(c) for c in canon):
            r.pages[i] = p
        if r.admit_matched:
            self.cm.release(r.prompt[: r.admit_matched])
        if len(dup) > admit_pages:                     # raced-in duplicates: ours
            self.cm.free(dup[admit_pages:])
        r.inserted_span = span
        r.admit_matched = 0

    def _decode(self, live: list[_Request]) -> None:
        b = self.max_batch                             # static batch width
        ids = np.zeros((b,), np.int32)
        pos = np.zeros((b,), np.int32)
        ctx = np.ones((b,), np.int32)
        slots = np.full((b,), -1, np.int32)
        state_idx = np.full((b,), -1, np.int32)   # -1 = dead row (pools skip)
        lora_idx = np.zeros((b,), np.int32)
        bt = np.zeros((b, self.max_pages_per_req), np.int32)
        for i, r in enumerate(live):
            seq_i = r.prompt_len + len(r.out_tokens)   # includes the new token
            self._ensure_pages(r, seq_i)
            ids[i] = r.token_at(seq_i - 1)
            pos[i] = seq_i - 1
            ctx[i] = seq_i
            slots[i] = self._slot(r, seq_i - 1)
            state_idx[i] = r.state_slot
            lora_idx[i] = r.lora_id
            bt[i, : len(r.pages)] = r.pages
        if any(r.sampling is not None and r.sampling.temperature > 0
               for r in live):
            seeds = np.zeros((b,), np.int32)
            steps = np.zeros((b,), np.int32)
            temp = np.zeros((b,), np.float32)   # dead rows stay greedy
            tk = np.zeros((b,), np.int32)
            tp = np.ones((b,), np.float32)
            mp = np.zeros((b,), np.float32)
            rep = np.ones((b,), np.float32)
            pres = np.zeros((b,), np.float32)
            freq = np.zeros((b,), np.float32)
            vocab = max((r.tok_counts.shape[0] for r in live
                         if r.tok_counts is not None), default=1)
            counts = np.zeros((b, vocab), np.int32)  # [b,1] no-op broadcast
            for i, r in enumerate(live):
                sp = r.sampling
                if sp is not None:
                    seeds[i], steps[i] = sp.seed, len(r.out_tokens)
                    temp[i], tk[i] = sp.temperature, sp.top_k
                    tp[i], mp[i] = sp.top_p, sp.min_p
                    if r.tok_counts is not None:
                        counts[i] = r.tok_counts
                        rep[i], pres[i] = sp.repetition_penalty, sp.presence_penalty
                        freq[i] = sp.frequency_penalty
            toks, lps, self.caches = self._jit_decode_sampled(
                jnp.asarray(ids), jnp.asarray(pos), self.caches, jnp.asarray(bt),
                jnp.asarray(ctx), jnp.asarray(slots), jnp.asarray(state_idx),
                jnp.asarray(lora_idx), jnp.asarray(seeds), jnp.asarray(steps),
                jnp.asarray(temp), jnp.asarray(tk), jnp.asarray(tp),
                jnp.asarray(mp), jnp.asarray(counts), jnp.asarray(rep),
                jnp.asarray(pres), jnp.asarray(freq))
        else:
            toks, lps, self.caches = self._jit_decode(
                jnp.asarray(ids), jnp.asarray(pos), self.caches, jnp.asarray(bt),
                jnp.asarray(ctx), jnp.asarray(slots), jnp.asarray(state_idx),
                jnp.asarray(lora_idx))
        toks = np.asarray(toks)
        lps = np.asarray(lps)
        for i, r in enumerate(live):
            if r.want_logprobs and not r.done:
                r.out_logprobs.append(float(lps[i]))
            self._append_token(r, int(toks[i]))
        self.stats["decode_steps"] += 1

    def _spec_decode(self, live: list[_Request]) -> None:
        """One speculative round: k chained draft tokens per request (batched
        draft decode steps), then ONE packed varlen verify on the target, then
        greedy tree acceptance — emits 1..k+1 tokens per request.

        Position bookkeeping (L = tokens known for a request): the draft chain
        feeds tokens at positions L-1..L+k-2 (writing draft KV as it goes); the
        verify rows are [last_token, d1..dk] at positions L-1..L+k-1.  After
        accepting n drafts + the bonus token, both pools are KV-correct through
        position L+n-1 and the next round starts exactly there — rejected
        tokens' stale rows are never read (masked by context length) and are
        overwritten when their position is reached again."""
        b, k = self.max_batch, self.spec_k
        n = len(live)
        Ls = np.zeros((n,), np.int64)
        bt = np.zeros((b, self.max_pages_per_req), np.int32)
        for i, r in enumerate(live):
            Ls[i] = r.prompt_len + len(r.out_tokens)
            self._ensure_pages(r, int(Ls[i]) + k)
            bt[i, : len(r.pages)] = r.pages
        bt_j = jnp.asarray(bt)
        lora = np.zeros((b,), np.int32)
        for i, r in enumerate(live):
            lora[i] = r.lora_id
        # --- draft chain: k batched decode steps ---
        cur = np.zeros((b,), np.int32)
        for i, r in enumerate(live):
            cur[i] = r.token_at(int(Ls[i]) - 1)
        drafts = np.zeros((n, k), np.int32)
        # k+1 steps: the extra one feeds d_k so draft KV covers position
        # L+k-1 — needed when ALL k drafts are accepted (no gap next round)
        for j in range(k + 1):
            pos = np.zeros((b,), np.int32)
            ctx = np.ones((b,), np.int32)
            slots = np.full((b,), -1, np.int32)
            state_idx = np.full((b,), -1, np.int32)
            for i, r in enumerate(live):
                p = int(Ls[i]) - 1 + j
                pos[i], ctx[i], slots[i] = p, p + 1, self._slot(r, p)
                state_idx[i] = r.state_slot
            toks, self.draft_caches = self._jit_draft_decode(
                jnp.asarray(cur), jnp.asarray(pos), self.draft_caches, bt_j,
                jnp.asarray(ctx), jnp.asarray(slots), jnp.asarray(state_idx),
                jnp.asarray(lora))
            cur = np.asarray(toks)
            if j < k:
                drafts[:, j] = cur[:n]
        # --- verify on the target ---
        d = k + 1
        cand = np.zeros((b, d), np.int32)
        vslots = np.full((b, d), -1, np.int32)
        for i, r in enumerate(live):
            cand[i, 0] = r.token_at(int(Ls[i]) - 1)
            cand[i, 1:] = drafts[i]
            for j in range(d):
                vslots[i, j] = self._slot(r, int(Ls[i]) - 1 + j)
        snaps = []
        if not self.a.prefill_single:
            # one packed varlen prefill scores every request's chain at once
            ids = np.zeros((b * d,), np.int32)
            seq_lens = np.zeros((b,), np.int32)
            ctx = np.ones((b,), np.int32)
            for i in range(n):
                ids[i * d : (i + 1) * d] = cand[i]
                seq_lens[i] = d
                ctx[i] = int(Ls[i]) + k
            state_idx = np.full((b,), -1, np.int32)
            target, self.caches = self._jit_verify(
                jnp.asarray(ids), jnp.asarray(seq_lens), self.caches, bt_j,
                jnp.asarray(ctx), jnp.asarray(vslots.reshape(-1)),
                jnp.asarray(state_idx), jnp.asarray(np.repeat(lora, d)))
            target = np.asarray(target).reshape(b, d)
        else:
            # per-request verify (prefill_single adapters).  With recurrent
            # state (snapshot hooks), snapshot first — the verify prefill
            # advances the GDN pools through REJECTED tokens, so acceptance
            # is followed by restore + a catch-up prefill of the accepted rows
            target = np.zeros((b, d), np.int32)
            for i, r in enumerate(live):
                si = jnp.asarray([r.state_slot], jnp.int32)
                if self.a.snapshot_state is not None:
                    snaps.append(self._jit_snapshot(self.caches, si))
                toks, self.caches = self._jit_verify_one(
                    jnp.asarray(cand[i]), jnp.int32(d), self.caches,
                    jnp.asarray(bt[i]), jnp.int32(int(Ls[i]) + k),
                    jnp.asarray(vslots[i]), si,
                    jnp.full((d,), r.lora_id, jnp.int32))
                target[i] = np.asarray(toks)
        # --- greedy chain-tree acceptance (the verify_tree_greedy op) ---
        ridx = np.tile(np.arange(d, dtype=np.int32), (b, 1)) + (
            np.arange(b, dtype=np.int32)[:, None] * d)
        nt = np.tile(np.asarray([*range(1, d), -1], np.int32), (b, 1))
        ns = np.full((b, d), -1, np.int32)
        predicts, accept_index, accept_num = self._jit_verify_tree(
            jnp.asarray(cand), jnp.asarray(ridx), jnp.asarray(nt),
            jnp.asarray(ns), jnp.asarray(target))
        predicts = np.asarray(predicts)
        accept_index = np.asarray(accept_index)
        accept_num = np.asarray(accept_num)
        for i, r in enumerate(live):
            n_acc = int(accept_num[i])
            new = [int(cand[i, int(accept_index[i, t]) - i * d])
                   for t in range(1, n_acc + 1)]
            new.append(int(predicts[int(accept_index[i, n_acc])]))  # bonus
            for t in new:
                if not r.done and len(r.out_tokens) < r.max_new_tokens:
                    self._append_token(r, t)
            self.stats["spec_accepted"] += n_acc
            if snaps and n_acc < k:
                # roll the GDN pools back to before the round, then advance
                # them through exactly the accepted rows ([last, d1..d_nacc]).
                # n_acc == k needs no rollback: the verify advanced the state
                # through exactly the accepted rows already.
                m = n_acc + 1
                si = jnp.asarray([r.state_slot], jnp.int32)
                self.caches = self._jit_restore(self.caches, snaps[i], si)
                cu_ids = np.zeros((d,), np.int32)
                cu_ids[:m] = cand[i, :m]
                cu_slots = np.full((d,), -1, np.int32)
                cu_slots[:m] = vslots[i, :m]
                _, self.caches = self._jit_verify_one(
                    jnp.asarray(cu_ids), jnp.int32(m), self.caches,
                    jnp.asarray(bt[i]), jnp.int32(int(Ls[i]) - 1 + m),
                    jnp.asarray(cu_slots), si,
                    jnp.full((d,), r.lora_id, jnp.int32))
        self.stats["spec_rounds"] += 1
        self.stats["decode_steps"] += 1

    def _spec_decode_tree(self, live: list[_Request]) -> None:
        """Tree speculative round dispatcher: each round verifies B root-
        branched draft chains per request, so the packed verify holds
        ``B × group`` virtual requests — process in groups that fit."""
        g = max(1, self.max_batch // self.spec_width)
        for i0 in range(0, len(live), g):
            self._spec_tree_round(live[i0 : i0 + g])
        self.stats["spec_rounds"] += 1
        self.stats["decode_steps"] += 1

    def _spec_tree_round(self, live: list[_Request]) -> None:
        """One tree round (EAGLE-2-style root branching, engine-only design).

        Draft: ONE decode on the request's real pages feeds the root token and
        yields the top-B choices of d1; each branch then chains k−1 more draft
        tokens.  Branches would collide in the paged KV (same logical
        positions), so every branch ≥ 1 gets COPY-ON-WRITE suffix pages: the
        ≤ 2 pages covering positions L−1..L+k−1 are copied (target + draft
        pools), and the branch's block table points at the copies — each path
        is then a plain causal chain, verified by the SAME packed varlen
        verify as chain mode.  Acceptance walks the real tree
        (ops.speculative.verify_tree_greedy, sibling chains at the root);
        if a branch ≥ 1 wins, its suffix pages are copied back into the real
        pages (swap would break radix-shared refcounts), so both pools hold
        the accepted path's KV.  Rejected rows beyond the acceptance point
        stay stale-but-masked exactly as in chain mode."""
        b, k, B, ps = self.max_batch, self.spec_k, self.spec_width, self.page
        n, d = len(live), self.spec_k + 1
        assert n * B <= b
        Ls = np.zeros((n,), np.int64)
        bt0 = np.zeros((b, self.max_pages_per_req), np.int32)
        lora = np.zeros((b,), np.int32)
        for i, r in enumerate(live):
            Ls[i] = r.prompt_len + len(r.out_tokens)
            self._ensure_pages(r, int(Ls[i]) + k)
            bt0[i, : len(r.pages)] = r.pages
            lora[i] = r.lora_id
        dead = np.full((b,), -1, np.int32)

        # --- draft step 0 (real pages): root token → top-B first drafts ---
        cur = np.zeros((b,), np.int32)
        pos = np.zeros((b,), np.int32)
        ctx = np.ones((b,), np.int32)
        slots = np.full((b,), -1, np.int32)
        for i, r in enumerate(live):
            p = int(Ls[i]) - 1
            cur[i] = r.token_at(p)
            pos[i], ctx[i], slots[i] = p, p + 1, self._slot(r, p)
        topb, self.draft_caches = self._jit_draft_topb(
            jnp.asarray(cur), jnp.asarray(pos), self.draft_caches,
            jnp.asarray(bt0), jnp.asarray(ctx), jnp.asarray(slots),
            jnp.asarray(dead), jnp.asarray(lora))
        topb = np.asarray(topb)[:n]                        # [n, B]

        # --- copy-on-write suffix pages for branches 1..B-1 ---
        plo = ((Ls - 1) // ps).astype(np.int64)
        phi = ((Ls - 1 + k) // ps).astype(np.int64)
        scratch: dict[tuple[int, int], list[int]] = {}
        src_ids, dst_ids = [], []
        for i, r in enumerate(live):
            npg = int(phi[i] - plo[i]) + 1
            for p in range(1, B):
                got = self.cm.alloc(npg)
                if len(got) < npg:
                    raise RuntimeError("out of KV pages for tree branches")
                pages = [int(x) for x in got]
                scratch[(i, p)] = pages
                for j in range(npg):
                    src_ids.append(r.pages[int(plo[i]) + j])
                    dst_ids.append(pages[j])
        src_j = jnp.asarray(np.asarray(src_ids, np.int32))
        dst_j = jnp.asarray(np.asarray(dst_ids, np.int32))
        self.caches = self._jit_copy_pages(self.caches, src_j, dst_j)
        self.draft_caches = self._jit_copy_pages(self.draft_caches, src_j, dst_j)

        # per-branch block tables + slot helper
        btp = np.repeat(bt0[None], B, axis=0)              # [B, b, max_pages]
        for (i, p), pages in scratch.items():
            for j, pg in enumerate(pages):
                btp[p, i, int(plo[i]) + j] = pg

        def path_slot(i, p, position):
            page_idx = position // ps
            pg = int(btp[p, i, page_idx])
            return pg * ps + position % ps

        # --- draft chains per branch (steps 1..k on the branch's pages) ---
        drafts = np.zeros((n, B, k), np.int32)
        drafts[:, :, 0] = topb
        for p in range(B):
            cur = np.zeros((b,), np.int32)
            cur[:n] = drafts[:, p, 0]
            for j in range(1, k + 1):
                for i in range(n):
                    q = int(Ls[i]) - 1 + j
                    pos[i], ctx[i] = q, q + 1
                    slots[i] = path_slot(i, p, q)
                toks, self.draft_caches = self._jit_draft_decode(
                    jnp.asarray(cur), jnp.asarray(pos), self.draft_caches,
                    jnp.asarray(btp[p]), jnp.asarray(ctx), jnp.asarray(slots),
                    jnp.asarray(dead), jnp.asarray(lora))
                cur = np.asarray(toks)
                if j < k:
                    drafts[:n, p, j] = cur[:n]

        # --- one packed varlen verify over n·B virtual chain-requests ---
        cand = np.zeros((n, B, d), np.int32)
        ids = np.zeros((b * d,), np.int32)
        seq_lens = np.zeros((b,), np.int32)
        vctx = np.ones((b,), np.int32)
        vslots = np.full((b * d,), -1, np.int32)
        btv = np.zeros((b, self.max_pages_per_req), np.int32)
        vlora = np.zeros((b,), np.int32)
        for i, r in enumerate(live):
            for p in range(B):
                vi = i * B + p
                cand[i, p, 0] = r.token_at(int(Ls[i]) - 1)
                cand[i, p, 1:] = drafts[i, p]
                ids[vi * d : (vi + 1) * d] = cand[i, p]
                seq_lens[vi] = d
                vctx[vi] = int(Ls[i]) + k
                btv[vi] = btp[p, i]
                vlora[vi] = r.lora_id
                for j in range(d):
                    vslots[vi * d + j] = path_slot(i, p, int(Ls[i]) - 1 + j)
        target, self.caches = self._jit_verify(
            jnp.asarray(ids), jnp.asarray(seq_lens), self.caches,
            jnp.asarray(btv), jnp.asarray(vctx), jnp.asarray(vslots),
            jnp.asarray(dead), jnp.asarray(np.repeat(vlora, d)))
        target = np.asarray(target).reshape(b, d)[: n * B].reshape(n, B, d)

        # --- acceptance over the REAL tree (root + B sibling chains) ---
        nodes = 1 + B * k
        cand_nodes = np.zeros((n, nodes), np.int32)
        tgt_nodes = np.zeros((n, nodes), np.int32)
        nt = np.full((n, nodes), -1, np.int32)
        ns = np.full((n, nodes), -1, np.int32)
        ridx = (np.tile(np.arange(nodes, dtype=np.int32), (n, 1))
                + np.arange(n, dtype=np.int32)[:, None] * nodes)
        for i in range(n):
            cand_nodes[i, 0] = cand[i, 0, 0]
            tgt_nodes[i, 0] = target[i, 0, 0]
            nt[i, 0] = 1
            for p in range(B):
                s0 = 1 + p * k
                if p + 1 < B:
                    ns[i, s0] = 1 + (p + 1) * k
                for j in range(k):
                    cand_nodes[i, s0 + j] = drafts[i, p, j]
                    tgt_nodes[i, s0 + j] = target[i, p, j + 1]
                    if j + 1 < k:
                        nt[i, s0 + j] = s0 + j + 1
        predicts, accept_index, accept_num = self._jit_verify_tree(
            jnp.asarray(cand_nodes), jnp.asarray(ridx), jnp.asarray(nt),
            jnp.asarray(ns), jnp.asarray(tgt_nodes))
        predicts = np.asarray(predicts)
        accept_index = np.asarray(accept_index)
        accept_num = np.asarray(accept_num)

        # --- commit: emit tokens; adopt a winning branch's pages by copy-back ---
        src_ids, dst_ids = [], []
        for i, r in enumerate(live):
            n_acc = int(accept_num[i])
            local = [int(accept_index[i, t]) - i * nodes
                     for t in range(1, n_acc + 1)]
            new = [int(cand_nodes[i, x]) for x in local]
            new.append(int(predicts[int(accept_index[i, n_acc])]))  # bonus
            win = 0 if n_acc == 0 else (local[-1] - 1) // k
            if win != 0:
                pages = scratch[(i, win)]
                for j, pg in enumerate(pages):
                    src_ids.append(pg)
                    dst_ids.append(r.pages[int(plo[i]) + j])
            for t in new:
                if not r.done and len(r.out_tokens) < r.max_new_tokens:
                    self._append_token(r, t)
            self.stats["spec_accepted"] += n_acc
        if src_ids:
            src_j = jnp.asarray(np.asarray(src_ids, np.int32))
            dst_j = jnp.asarray(np.asarray(dst_ids, np.int32))
            self.caches = self._jit_copy_pages(self.caches, src_j, dst_j)
            self.draft_caches = self._jit_copy_pages(
                self.draft_caches, src_j, dst_j)
        for pages in scratch.values():
            self.cm.free(np.asarray(pages, np.int32))

    def _retire(self) -> None:
        for r in [x for x in self.running if x.done]:
            if self.host_cm is not None:
                self._host_offload(r)
            if r.inserted_span:
                self.cm.release(r.prompt[: r.inserted_span])
            elif r.admit_matched:
                self.cm.release(r.prompt[: r.admit_matched])
            shared = (r.inserted_span or r.admit_matched) // self.page
            if len(r.pages) > shared:
                self.cm.free(np.asarray(r.pages[shared:], np.int32))
            self.finished[r.rid] = list(r.out_tokens)
            if r.want_logprobs:
                self.logprobs[r.rid] = list(r.out_logprobs)
            if r.state_slot >= 0:
                self._free_state_slots.append(r.state_slot)
            self.running.remove(r)
