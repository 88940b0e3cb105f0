"""Linear-sum assignment (Hungarian algorithm) in pure numpy/python.

The reference's videotext evaluators delegate to
scipy.optimize.linear_sum_assignment (evaluate_utils.py:104 Hungary,
maximize=True); scipy is not available in this environment, so this is
the classic O(n^3) potentials ("Kuhn-Munkres with dual variables")
formulation from the standard algorithm literature. For square
matrices it returns an assignment with the same OPTIMAL TOTAL as
scipy; tie-breaking between equally-optimal assignments may differ
(documented where consumed — protocol fixtures pin unique optima)."""

from __future__ import annotations

import numpy as np


def hungarian_min(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Minimum-cost perfect assignment on a square matrix ->
    (row_ind, col_ind), row_ind = arange(n)."""
    a = np.asarray(cost, dtype=np.float64)
    n = a.shape[0]
    if a.shape != (n, n):
        raise ValueError("hungarian_min requires a square matrix")
    INF = float("inf")
    u = [0.0] * (n + 1)
    v = [0.0] * (n + 1)
    p = [0] * (n + 1)  # p[j] = row matched to column j (1-based)
    way = [0] * (n + 1)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = [INF] * (n + 1)
        used = [False] * (n + 1)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = INF
            j1 = -1
            for j in range(1, n + 1):
                if not used[j]:
                    cur = a[i0 - 1, j - 1] - u[i0] - v[j]
                    if cur < minv[j]:
                        minv[j] = cur
                        way[j] = j0
                    if minv[j] < delta:
                        delta = minv[j]
                        j1 = j
            if j1 == -1:
                # every unused column has infinite reduced cost — only
                # possible with non-finite inputs; fail loudly instead
                # of silently corrupting used[-1]
                raise ValueError(
                    "hungarian_min: no finite augmenting column (non-finite cost input?)"
                )
            for j in range(n + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    col_of_row = np.zeros(n, dtype=np.int64)
    for j in range(1, n + 1):
        if p[j]:
            col_of_row[p[j] - 1] = j - 1
    return np.arange(n), col_of_row


def hungarian_max(value: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Maximum-total assignment (the reference's Hungary semantics)."""
    return hungarian_min(-np.asarray(value, dtype=np.float64))
