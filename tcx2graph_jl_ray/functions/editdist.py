"""Banded Levenshtein distance, vectorized across many string pairs.

The verify kernel for the Ed-Join style edit-distance similarity join
(stages/dedup.py:edit_distance_pairs). Candidates arrive in batches; a
Python-per-pair DP would be the classic row-loop anti-pattern, so the DP
runs as O(Lmax * (2k+1)) numpy steps over ALL pairs at once: the band
|i - j| <= k is the only part of the matrix a distance <= k can traverse
(Ukkonen 1985's cutoff), so each row is a (n_pairs, 2k+1) slab.

Distances are exact for values <= k and reported as k+1 ("greater than
the threshold") beyond — the join only ever needs that cap.
"""

from __future__ import annotations

import numpy as np


def banded_edit_distances(a_list, b_list, k: int) -> np.ndarray:
    """Exact Levenshtein distance per (a_list[i], b_list[i]) pair, capped
    at ``k + 1``. Pairs with ``abs(len diff) > k`` short-circuit to the cap
    (a length gap of d needs at least d indels)."""
    n = len(a_list)
    cap = np.int64(k + 1)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    la = np.fromiter((len(s) for s in a_list), dtype=np.int64, count=n)
    lb = np.fromiter((len(s) for s in b_list), dtype=np.int64, count=n)
    ans = np.full(n, cap, dtype=np.int64)
    live = np.abs(la - lb) <= k
    # degenerate empties: d(a, "") = len(a)
    empt = live & ((la == 0) | (lb == 0))
    ans[empt] = np.minimum(np.maximum(la, lb)[empt], cap)
    live &= ~empt
    if not live.any():
        return ans
    idx = np.flatnonzero(live)
    la_l, lb_l = la[idx], lb[idx]
    p = len(idx)
    l_max = int(la_l.max())
    # char matrices with UNEQUAL pad sentinels so padding never matches;
    # B gets k+1 extra columns so the band's j index never overruns
    A = np.full((p, l_max), -1, dtype=np.int64)
    B = np.full((p, l_max + k + 1), -2, dtype=np.int64)
    for r, i in enumerate(idx):
        a, b = a_list[i], b_list[i]
        A[r, : len(a)] = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
        B[r, : len(b)] = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    w = 2 * k + 1
    inf = cap  # one min-op never drops below true value once capped
    # row i = 0: D[0, j] = j at band offset t = j + k
    prev = np.full((p, w), inf, dtype=np.int64)
    for t in range(k, w):
        prev[:, t] = t - k
    out = np.full(p, cap, dtype=np.int64)
    t_fin = (lb_l - la_l + k)[:, None]  # capture column at row i == la
    for i in range(1, l_max + 1):
        ai = A[:, i - 1][:, None]  # (p, 1)
        cur = np.full((p, w), inf, dtype=np.int64)
        for t in range(w):
            j = i + t - k
            if j < 0:
                continue
            if j == 0:
                cur[:, t] = min(i, int(cap))
                continue
            diag = prev[:, t] + (ai[:, 0] != B[:, j - 1])
            dele = prev[:, t + 1] + 1 if t + 1 < w else inf
            ins = cur[:, t - 1] + 1 if t >= 1 else inf
            v = np.minimum(np.minimum(diag, dele), ins)
            np.minimum(v, cap, out=v)
            # states past b's end are unreachable
            cur[:, t] = np.where(j <= lb_l, v, inf)
        hit = la_l == i
        if hit.any():
            fin = np.take_along_axis(cur, t_fin, axis=1)[:, 0]
            out = np.where(hit, np.minimum(fin, cap), out)
        prev = cur
    ans[idx] = out
    return ans
