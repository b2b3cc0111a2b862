"""Failure-diagnosis helpers for EP communication.

Parity with reference ``tests/python/deepep/utils.py:232-294`` ``diagnose_matrix``:
given a rank×rank cost/wait matrix (our dispatch returns ``recv_count_matrix`` and
drop counters; a Pallas comm backend will add wait-cycle stats), flag rows, columns
and points that are abnormally high — the signature of a slow or straggling rank.
"""

from __future__ import annotations

import numpy as np


def diagnose_matrix(mat, thres_col: float = 3.0, thres_row: float = 3.0,
                    thres_point: float = 5.0):
    """Flag abnormal rows/cols/points of a rank×rank matrix.

    Returns dict with ``abnormal_rows``, ``abnormal_cols``, ``abnormal_points``
    (indices where the mean/value exceeds ``thres·overall_mean``).
    """
    m = np.asarray(mat, np.float64)
    overall = m.mean() + 1e-12
    rows = np.where(m.mean(axis=1) > thres_row * overall)[0].tolist()
    cols = np.where(m.mean(axis=0) > thres_col * overall)[0].tolist()
    pts = [tuple(p) for p in np.argwhere(m > thres_point * overall).tolist()]
    return {"abnormal_rows": rows, "abnormal_cols": cols, "abnormal_points": pts}


def expert_balance_report(recv_count_matrix) -> dict:
    """EPLB signal from dispatch stats: per-expert load imbalance across sources."""
    m = np.asarray(recv_count_matrix, np.float64)  # [src_rank, local_expert] (or stacked)
    per_expert = m.sum(axis=0)
    mean = per_expert.mean() + 1e-12
    return {
        "per_expert_tokens": per_expert.tolist(),
        "max_over_mean": float(per_expert.max() / mean),
        "empty_experts": int((per_expert == 0).sum()),
    }
