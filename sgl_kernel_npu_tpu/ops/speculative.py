"""EAGLE speculative decoding: tree build + greedy tree verification.

Capability parity with reference ``build_tree_kernel_efficient`` (csrc/build_tree;
golden python/sgl_kernel_npu/sgl_kernel_npu/speculative.py:17
``build_tree_efficient_native``) and ``verify_tree_greedy``
(sample/verify_tree_greedy.py:69; tree-walk golden speculative.py:135).

TPU-native design: the reference's nested data-dependent loops become
- a vectorized parent resolution (one argmax per node),
- a sequential-in-depth ``fori_loop`` building depths and ancestor masks
  (draft trees are tiny — ≤64 nodes — so the loop is trivially cheap),
- a ``vmap`` over the batch.
Everything is functional: outputs are returned, not written into preallocated
buffers.
"""

from __future__ import annotations

import functools
from enum import IntEnum

import jax
import jax.numpy as jnp


class TreeMaskMode(IntEnum):
    FULL_MASK = 0
    QLEN_ONLY = 1
    QLEN_ONLY_BITPACKING = 2


def _resolve_parents(parent_list, selected_index, topk: int):
    """Per node i (1..D-1): index of its parent node in the draft-token order.

    Mirrors speculative.py:88-101/117-127: parent table index 0 = root; otherwise
    the parent node is (first position of parent_list[ptb] in selected_index) + 1.
    """
    d = selected_index.shape[0] + 1
    ptb = selected_index // topk                      # [D-1] parent table idx per node i+1
    parent_token = parent_list[ptb]                   # token id of the parent
    eq = selected_index[None, :] == parent_token[:, None]  # [D-1 (node), D-1 (pos)]
    first = jnp.argmax(eq, axis=1).astype(jnp.int32) + 1
    found = jnp.any(eq, axis=1)
    parent_node = jnp.where(ptb == 0, 0, jnp.where(found, first, d))  # d = invalid
    return parent_node  # [D-1], parent of node i is parent_node[i-1]


def _tree_links(parent_node, d: int):
    """next_token / next_sibling chains: children attach in ascending node order."""
    nodes = jnp.arange(1, d, dtype=jnp.int32)
    parents = parent_node  # [D-1]
    # next_token[p] = smallest child of p
    next_token = jnp.full((d,), jnp.iinfo(jnp.int32).max, jnp.int32)
    next_token = next_token.at[parents].min(nodes, mode="drop")
    next_token = jnp.where(next_token == jnp.iinfo(jnp.int32).max, -1, next_token)
    # next_sibling[i] = smallest child of parent(i) greater than i
    same_parent = parents[None, :] == parents[:, None]       # [D-1, D-1]
    greater = nodes[None, :] > nodes[:, None]
    cand = jnp.where(same_parent & greater, nodes[None, :], jnp.iinfo(jnp.int32).max)
    sib = jnp.min(cand, axis=1)
    sib = jnp.where(sib == jnp.iinfo(jnp.int32).max, -1, sib)
    next_sibling = jnp.concatenate([jnp.array([-1], jnp.int32), sib])
    return next_token, next_sibling


def _depth_and_ancestors(parent_node, d: int):
    """depth[i] and ancestor mask[i, j] (j ancestor-or-self of i); parents precede
    children in EAGLE draft order, so one sequential pass suffices."""
    parent_full = jnp.concatenate([jnp.zeros(1, jnp.int32), parent_node]).clip(0, d - 1)

    def body(i, state):
        depth, anc = state
        p = parent_full[i]
        depth = depth.at[i].set(depth[p] + 1)
        anc = anc.at[i].set(anc[p].at[i].set(True))
        return depth, anc

    depth0 = jnp.zeros((d,), jnp.int32)
    anc0 = jnp.zeros((d, d), bool).at[0, 0].set(True)
    depth, anc = jax.lax.fori_loop(1, d, body, (depth0, anc0))
    return depth, anc


@functools.partial(jax.jit, static_argnames=("topk", "draft_token_num", "tree_mask_mode", "prefix_len"))
def build_tree_efficient(
    parent_list: jax.Array,       # [bs, P] token ids of candidate parents
    selected_index: jax.Array,    # [bs, D-1] chosen draft tokens (indices into topk grid)
    verified_seq_len: jax.Array,  # [bs]
    *,
    topk: int,
    draft_token_num: int,
    tree_mask_mode: int = TreeMaskMode.QLEN_ONLY,
    prefix_len: int | None = None,
):
    """Build the EAGLE tree attention metadata.

    Returns ``(positions [bs*D], retrive_index [bs, D], retrive_next_token [bs, D],
    retrive_next_sibling [bs, D], tree_mask)`` where ``tree_mask`` is
    ``[bs, D, D]`` bool for QLEN_ONLY, ``[bs, D, ceil(D/8)]`` uint8 for
    QLEN_ONLY_BITPACKING, or ``[bs, D, prefix_len + D]`` bool for FULL_MASK
    (``prefix_len`` = static max sequence length; prefix columns < seq_len are True).
    """
    bs = parent_list.shape[0]
    d = draft_token_num

    def per_batch(pl_, sel):
        parent_node = _resolve_parents(pl_, sel, topk)
        nt, ns = _tree_links(parent_node, d)
        depth, anc = _depth_and_ancestors(parent_node, d)
        return parent_node, nt, ns, depth, anc

    _, next_token, next_sibling, depth, anc = jax.vmap(per_batch)(
        parent_list, selected_index
    )
    positions = (verified_seq_len[:, None] + depth).reshape(-1)
    retrive_index = (
        jnp.arange(bs, dtype=jnp.int32)[:, None] * d + jnp.arange(d, dtype=jnp.int32)[None]
    )

    if tree_mask_mode == TreeMaskMode.QLEN_ONLY:
        tree_mask = anc
    elif tree_mask_mode == TreeMaskMode.QLEN_ONLY_BITPACKING:
        pad = (-d) % 8
        bits = jnp.pad(anc, ((0, 0), (0, 0), (0, pad))).reshape(bs, d, -1, 8)
        weights = (1 << jnp.arange(8, dtype=jnp.uint8))
        tree_mask = jnp.sum(bits.astype(jnp.uint8) * weights, axis=-1, dtype=jnp.uint32).astype(jnp.uint8)
    elif tree_mask_mode == TreeMaskMode.FULL_MASK:
        assert prefix_len is not None, "FULL_MASK needs a static prefix_len"
        prefix = jnp.arange(prefix_len)[None, None, :] < verified_seq_len[:, None, None]
        prefix = jnp.broadcast_to(prefix, (bs, d, prefix_len))
        tree_mask = jnp.concatenate([prefix, anc], axis=-1)
    else:
        raise ValueError(f"unknown tree_mask_mode {tree_mask_mode}")
    return positions, retrive_index, next_token, next_sibling, tree_mask


@jax.jit
def verify_tree_greedy(
    candidates: jax.Array,            # [bs, D] draft token ids
    retrive_index: jax.Array,         # [bs, D] global output slots
    retrive_next_token: jax.Array,    # [bs, D]
    retrive_next_sibling: jax.Array,  # [bs, D]
    target_predict: jax.Array,        # [bs, D] target model argmax per node
):
    """Greedy tree verification (golden: speculative.py:135 verify_tree_greedy_native).

    Returns ``(predicts [bs*D], accept_index [bs, D], accept_token_num [bs])``;
    unaccepted slots of ``predicts``/``accept_index`` are -1.
    """
    bs, d = candidates.shape

    def per_row(cand, ridx, nt, ns, tgt):
        def sibling_walk(node, last_local):
            """Scan the sibling chain for a token matching target[last_local]."""

            def cond(s):
                node, found = s
                return (node != -1) & (~found)

            def body(s):
                node, _ = s
                match = cand[node] == tgt[last_local]
                return jax.lax.cond(
                    match, lambda: (node, True), lambda: (ns[node], False)
                )

            node, found = jax.lax.while_loop(cond, body, (node, False))
            return node, found

        def step(_, state):
            cur, last, n_acc, done, predicts, accept = state
            child = nt[cur]
            node, found = sibling_walk(child, last)
            take = found & (~done)

            predicts = jnp.where(take, predicts.at[last].set(tgt[last]), predicts)
            n_acc_new = n_acc + 1
            accept = jnp.where(take, accept.at[n_acc_new].set(ridx[node]), accept)
            cur = jnp.where(take, node, cur)
            last = jnp.where(take, node, last)
            n_acc = jnp.where(take, n_acc_new, n_acc)
            done = done | (~found)
            return cur, last, n_acc, done, predicts, accept

        predicts0 = jnp.full((d,), -1, target_predict.dtype)
        accept0 = jnp.full((d,), -1, jnp.int32).at[0].set(ridx[0])
        cur, last, n_acc, done, predicts, accept = jax.lax.fori_loop(
            1, d, step, (0, 0, 0, False, predicts0, accept0)
        )
        predicts = predicts.at[last].set(tgt[last])
        return predicts, accept, n_acc

    predicts, accept_index, accept_num = jax.vmap(per_row)(
        candidates, retrive_index, retrive_next_token, retrive_next_sibling, target_predict
    )
    return predicts.reshape(-1), accept_index, accept_num.astype(jnp.int32)
