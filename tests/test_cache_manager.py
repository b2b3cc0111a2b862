"""Native radix cache manager (C++ via ctypes)."""

import numpy as np
import pytest

from sgl_kernel_npu_tpu.runtime import RadixCacheManager


@pytest.fixture
def cm():
    return RadixCacheManager(num_pages=16, page_size=4)


def test_alloc_and_free(cm):
    assert cm.free_pages == 16
    pages = cm.alloc(5)
    assert len(pages) == 5 and cm.free_pages == 11
    cm.free(pages)
    assert cm.free_pages == 16


def test_match_insert_share(cm):
    seq = np.arange(12, dtype=np.int32)          # 3 full pages
    pages = cm.alloc(3)
    inserted, dup = cm.insert(seq, pages)
    assert inserted == 3 and len(dup) == 0
    # a second request with the same 2-page prefix + new tail
    seq2 = np.concatenate([seq[:8], np.array([99, 98, 97, 96], np.int32)])
    matched, got = cm.match(seq2)
    assert matched == 8
    np.testing.assert_array_equal(got, pages[:2])
    # inserting seq2 reuses the prefix: only the tail page is new
    tail = cm.alloc(3)
    ins2, dup2 = cm.insert(seq2, tail)
    assert ins2 == 1 and len(dup2) == 2
    cm.free(dup2)


def test_eviction_under_pressure(cm):
    seq = np.arange(8, dtype=np.int32)
    pages = cm.alloc(2)
    cm.insert(seq, pages, ref=1)
    cm.release(seq)                 # refcount → 0, evictable
    # cached pages count toward capacity until evicted
    assert cm.cached_pages == 2
    got = cm.alloc(16)              # demands everything incl. eviction
    assert len(got) == 16
    assert cm.cached_pages == 0
    # nothing left and nothing evictable → partial allocation
    assert len(cm.alloc(1)) == 0


def test_refcount_protects_from_eviction(cm):
    seq = np.arange(8, dtype=np.int32)
    cm.insert(seq, cm.alloc(2), ref=1)   # held by inserter
    got = cm.alloc(14)
    assert len(got) == 14                 # only the truly free pages
    matched, _ = cm.match(seq)
    assert matched == 8                   # still cached
