"""Independent numpy oracles for every op, written as direct O(N*P1*P2) loops
mirroring the reference C++ CPU kernels (the reference's own dual-
implementation test pattern, SURVEY §4.1).  Deliberately slow and simple."""

import numpy as np


def knn_np(p1, p2, lengths1, lengths2, K, norm=2):
    """Reference knn_cpu.cpp:13-72 + the Python sort/pad layer knn.py:74-94."""
    N, P1, D = p1.shape
    dists = np.zeros((N, P1, K), np.float32)
    idx = np.zeros((N, P1, K), np.int64)
    for n in range(N):
        L1, L2 = int(lengths1[n]), int(lengths2[n])
        for i in range(L1):
            d = p2[n, :L2] - p1[n, i]
            if norm == 2:
                dd = (d * d).sum(-1)
            else:
                dd = np.abs(d).sum(-1)
            k_n = min(K, L2)
            order = np.argsort(dd, kind="stable")[:k_n]
            dists[n, i, :k_n] = dd[order]
            idx[n, i, :k_n] = order
    return dists, idx


def knn_backward_np(p1, p2, lengths1, lengths2, idx, norm, grad_dists):
    """Reference knn.cu:467-517 element loops."""
    N, P1, K = idx.shape
    D = p1.shape[2]
    gp1 = np.zeros_like(p1)
    gp2 = np.zeros_like(p2)
    for n in range(N):
        for i in range(int(lengths1[n])):
            for k in range(min(K, int(lengths2[n]))):
                j = int(idx[n, i, k])
                if j == -1:
                    continue
                g = grad_dists[n, i, k]
                for d in range(D):
                    if norm == 1:
                        sign = 1.0 if p1[n, i, d] > p2[n, j, d] else -1.0
                        diff = g * sign
                    else:
                        diff = 2.0 * g * (p1[n, i, d] - p2[n, j, d])
                    gp1[n, i, d] += diff
                    gp2[n, j, d] -= diff
    return gp1, gp2


def ball_query_np(p1, p2, lengths1, lengths2, K, radius):
    """Reference ball_query.cu:25-70: first-K in scan order within radius."""
    N, P1, D = p1.shape
    r2 = radius * radius
    dists = np.zeros((N, P1, K), np.float32)
    idx = np.full((N, P1, K), -1, np.int64)
    for n in range(N):
        for i in range(int(lengths1[n])):
            count = 0
            for j in range(int(lengths2[n])):
                if count >= K:
                    break
                dd = ((p1[n, i] - p2[n, j]) ** 2).sum()
                if dd < r2:
                    idx[n, i, count] = j
                    dists[n, i, count] = dd
                    count += 1
    return dists, idx


def fps_np(points, lengths, K_arr, start_idxs):
    """Reference sample_farthest_points_cpu.cpp:14-104 (std::max_element
    tie-breaking: first max wins)."""
    N, P, D = points.shape
    max_K = int(np.max(K_arr))
    idx = np.full((N, max_K), -1, np.int64)
    for n in range(N):
        L = int(lengths[n])
        k_n = min(L, int(K_arr[n]))
        if k_n <= 0:
            continue
        closest = np.full((L,), np.inf, np.float32)
        last = int(start_idxs[n])
        idx[n, 0] = last
        for i in range(1, k_n):
            d2 = ((points[n, :L] - points[n, last]) ** 2).sum(-1)
            closest = np.minimum(closest, d2)
            last = int(np.argmax(closest))
            idx[n, i] = last
    return idx


def packed_to_padded_np(inputs, first_idxs, max_size):
    F = inputs.shape[0]
    N = first_idxs.shape[0]
    D = inputs.shape[1]
    sizes = np.diff(np.concatenate([first_idxs, [F]]))
    out = np.zeros((N, max_size, D), inputs.dtype)
    for n in range(N):
        s = int(sizes[n])
        out[n, :s] = inputs[int(first_idxs[n]) : int(first_idxs[n]) + s]
    return out


def sample_pdf_np(bins, weights, u, eps):
    """Reference sample_pdf_cpu.cpp:24-99 (linear-scan variant)."""
    B, nb1 = bins.shape
    n_bins = nb1 - 1
    n_samples = u.shape[1]
    out = np.zeros((B, n_samples), np.float32)
    for b in range(B):
        total = weights[b].sum() + eps
        for s in range(n_samples):
            uniform = total * u[b, s]
            i_bin = 0
            while i_bin + 1 < n_bins and uniform > weights[b, i_bin]:
                uniform -= weights[b, i_bin]
                i_bin += 1
            bin_start, bin_end = bins[b, i_bin], bins[b, i_bin + 1]
            bw = weights[b, i_bin]
            if uniform > bw:
                val = bin_end
            elif bw > eps:
                val = bin_start + (uniform / bw) * (bin_end - bin_start)
            else:
                val = bin_start
            out[b, s] = val
    return out


def chamfer_np(
    x, y, x_lengths, y_lengths, point_reduction="mean", batch_reduction="mean",
    norm=2, weights=None,
):
    """Direct chamfer computation via knn_np (K=1)."""
    N = x.shape[0]
    dx, _ = knn_np(x, y, x_lengths, y_lengths, 1, norm)
    dy, _ = knn_np(y, x, y_lengths, x_lengths, 1, norm)
    cx, cy = dx[..., 0], dy[..., 0]
    if weights is not None:
        cx = cx * weights[:, None]
        cy = cy * weights[:, None]
    if point_reduction == "max":
        cx, cy = cx.max(1), cy.max(1)
        loss = np.maximum(cx, cy)
    elif point_reduction is not None:
        cx, cy = cx.sum(1), cy.sum(1)
        if point_reduction == "mean":
            cx = cx / np.maximum(x_lengths, 1)
            cy = cy / np.maximum(y_lengths, 1)
        loss = cx + cy
    else:
        return cx, cy
    if batch_reduction == "sum":
        loss = loss.sum()
    elif batch_reduction == "mean":
        div = weights.sum() if weights is not None else max(N, 1)
        loss = loss.sum() / div
    return loss
