"""Tree build/verify vs a from-scratch numpy port of the reference natives
(speculative.py:17 build_tree_efficient_native, :135 verify_tree_greedy_native)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sgl_kernel_npu_tpu.ops import speculative as sp


def _np_verify(candidates, retrive_index, next_token, next_sibling, target):
    bs, d = candidates.shape
    predicts = np.full(bs * d, -1, np.int64)
    accept_index = np.full((bs, d), -1, np.int64)
    accept_num = np.zeros(bs, np.int64)
    for bx in range(bs):
        last = retrive_index[bx, 0]
        accept_index[bx, 0] = last
        n_acc, cur = 0, 0
        for _ in range(1, d):
            cur = next_token[bx, cur]
            found = False
            while cur != -1:
                tok = candidates[bx, cur]
                tgt = target[bx, last - d * bx]
                if tok == tgt:
                    predicts[last] = tgt
                    n_acc += 1
                    accept_index[bx, n_acc] = retrive_index[bx, cur]
                    last = retrive_index[bx, cur]
                    found = True
                    break
                cur = next_sibling[bx, cur]
            if not found:
                break
        accept_num[bx] = n_acc
        predicts[last] = target[bx, last - d * bx]
    return predicts, accept_index, accept_num


def _chain_tree(bs, d):
    """Simple chain: node i's child is i+1."""
    nt = np.full((bs, d), -1, np.int32)
    nt[:, :-1] = np.arange(1, d)
    ns = np.full((bs, d), -1, np.int32)
    ridx = np.arange(bs * d).reshape(bs, d).astype(np.int32)
    return nt, ns, ridx


def test_verify_chain(rng):
    bs, d = 4, 6
    nt, ns, ridx = _chain_tree(bs, d)
    cand = rng.integers(0, 50, (bs, d))
    target = rng.integers(0, 50, (bs, d))
    # force some accepts: row 0 accepts 2 tokens, row 1 all, row 2 none
    cand[0, 1] = target[0, 0]; cand[0, 2] = target[0, 1]; cand[0, 3] = target[0, 2] + 1
    for i in range(1, d):
        cand[1, i] = target[1, i - 1]
    cand[2, 1] = target[2, 0] + 1
    p, ai, an = sp.verify_tree_greedy(
        jnp.asarray(cand), jnp.asarray(ridx), jnp.asarray(nt), jnp.asarray(ns),
        jnp.asarray(target),
    )
    pn, ain, ann = _np_verify(cand, ridx, nt, ns, target)
    np.testing.assert_array_equal(np.asarray(an), ann)
    np.testing.assert_array_equal(np.asarray(ai), ain)
    np.testing.assert_array_equal(np.asarray(p), pn)


def test_verify_branching_tree(rng):
    """Tree: root → {1, 2}; 1 → {3}; 2 → {4, 5}."""
    bs, d = 2, 6
    nt = np.tile(np.array([1, 3, 4, -1, -1, -1], np.int32), (bs, 1))
    ns = np.tile(np.array([-1, 2, -1, -1, 5, -1], np.int32), (bs, 1))
    ridx = np.arange(bs * d).reshape(bs, d).astype(np.int32)
    cand = rng.integers(0, 50, (bs, d))
    target = rng.integers(0, 50, (bs, d))
    # row 0: accept node 2 (sibling path), then node 5
    cand[0, 1] = target[0, 0] + 1
    cand[0, 2] = target[0, 0]
    cand[0, 4] = target[0, 2] + 1
    cand[0, 5] = target[0, 2]
    p, ai, an = sp.verify_tree_greedy(
        jnp.asarray(cand), jnp.asarray(ridx), jnp.asarray(nt), jnp.asarray(ns),
        jnp.asarray(target),
    )
    pn, ain, ann = _np_verify(cand, ridx, nt, ns, target)
    np.testing.assert_array_equal(np.asarray(an), ann)
    np.testing.assert_array_equal(np.asarray(ai), ain)
    np.testing.assert_array_equal(np.asarray(p), pn)
    assert int(an[0]) == 2


def test_build_tree_links_and_positions():
    """topk=2, draft=5.  selected_index encodes each node's (parent slot, k)."""
    topk, d = 2, 5
    bs = 1
    # parent_list: token ids addressable by parent table idx
    parent_list = jnp.asarray([[100, 101, 102, 103, 104, 105, 106, 107]], jnp.int32)
    # nodes 1..4 with selected_index = chosen token ids (also index//topk = table idx)
    # node1: sel=0 → ptb=0 → parent root; node2: sel=1 → ptb=0 → root
    # node3: sel=2 → ptb=1 → parent token parent_list[1]=101; position of 101 in
    #         selected? selected tokens are [0,1,2,6]... we need sel values s.t.
    #         parent token appears in selected_index.
    sel = jnp.asarray([[0, 1, 2, 6]], jnp.int32)
    # make parent_list[1] == selected_index[?]: parent_list[1]=101 — not in sel.
    # Choose parent_list so lookups resolve: parent_list[1] = 1 (node2's token),
    # parent_list[3] = 2 (node3's token)
    parent_list = jnp.asarray([[999, 1, 999, 2, 999, 999, 999, 999]], jnp.int32)
    # node3: sel=2 → ptb=1 → parent token 1 → first pos of 1 in sel = 1 → parent node 2
    # node4: sel=6 → ptb=3 → parent token 2 → first pos of 2 in sel = 2 → parent node 3
    seq_len = jnp.asarray([10], jnp.int32)
    pos, ridx, nt, ns, mask = sp.build_tree_efficient(
        parent_list, sel, seq_len, topk=topk, draft_token_num=d,
        tree_mask_mode=int(sp.TreeMaskMode.QLEN_ONLY),
    )
    # tree: root → {1, 2}; 2 → {3}; 3 → {4}
    np.testing.assert_array_equal(np.asarray(nt)[0], [1, -1, 3, 4, -1])
    np.testing.assert_array_equal(np.asarray(ns)[0], [-1, 2, -1, -1, -1])
    np.testing.assert_array_equal(np.asarray(pos), [10, 11, 11, 12, 13])
    m = np.asarray(mask)[0]
    # ancestors: node4 sees {0,2,3,4}
    np.testing.assert_array_equal(np.where(m[4])[0], [0, 2, 3, 4])
    np.testing.assert_array_equal(np.where(m[1])[0], [0, 1])
    # full mask mode stacks prefix columns
    _, _, _, _, full = sp.build_tree_efficient(
        parent_list, sel, seq_len, topk=topk, draft_token_num=d,
        tree_mask_mode=int(sp.TreeMaskMode.FULL_MASK), prefix_len=16,
    )
    f = np.asarray(full)[0]
    assert f.shape == (d, 16 + d)
    assert f[:, :10].all() and not f[:, 10:16].any()
    # bitpacked mode packs the qlen mask
    _, _, _, _, packed = sp.build_tree_efficient(
        parent_list, sel, seq_len, topk=topk, draft_token_num=d,
        tree_mask_mode=int(sp.TreeMaskMode.QLEN_ONLY_BITPACKING),
    )
    pk = np.asarray(packed)[0]
    assert pk.shape == (d, 1)
    assert pk[4, 0] == (1 << 0) + (1 << 2) + (1 << 3) + (1 << 4)
