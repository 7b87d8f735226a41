"""Pallas kernel tests, run in interpreter mode on the CPU mesh so they are
hardware-independent; the same kernels are exercised compiled on real TPU by
bench.py and the driver's entry checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch3d_pointops_tpu.kernels.fps_pallas import fps_pallas
from pytorch3d_pointops_tpu.kernels.knn_pallas import knn_forward_pallas
from pytorch3d_pointops_tpu.ops.fps import _fps_single
from pytorch3d_pointops_tpu.ops.knn import _knn_forward_full


def _clouds(key, N, P1, P2, D=3):
    k1, k2, k3 = jax.random.split(key, 3)
    p1 = jax.random.normal(k1, (N, P1, D), jnp.float32)
    p2 = jax.random.normal(k2, (N, P2, D), jnp.float32)
    l2 = jax.random.randint(k3, (N,), 1, P2 + 1)
    return p1, p2, l2


@pytest.mark.parametrize("norm", [1, 2])
@pytest.mark.parametrize("K", [1, 8])  # K=1 exercises the min-only fast path
def test_knn_pallas_matches_xla(norm, K):
    p1, p2, l2 = _clouds(jax.random.PRNGKey(norm), 2, 100, 300)
    l1 = jnp.full((2,), 100, jnp.int32)
    d_pal, i_pal = knn_forward_pallas(
        p1, p2, l2, K=K, norm=norm, tile_p1=32, tile_p2=64, interpret=True
    )
    d_ref, i_ref = _knn_forward_full(p1, p2, l1, l2, K, norm)
    np.testing.assert_allclose(
        np.asarray(d_pal), np.asarray(d_ref), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(i_pal), np.asarray(i_ref))


def test_knn_pallas_unaligned_sizes():
    """P1/P2 not multiples of the tile sizes exercise the padding path."""
    p1, p2, l2 = _clouds(jax.random.PRNGKey(7), 2, 45, 77)
    l1 = jnp.full((2,), 45, jnp.int32)
    d_pal, i_pal = knn_forward_pallas(
        p1, p2, l2, K=4, tile_p1=32, tile_p2=32, interpret=True
    )
    d_ref, i_ref = _knn_forward_full(p1, p2, l1, l2, 4, 2)
    np.testing.assert_allclose(np.asarray(d_pal), np.asarray(d_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_pal), np.asarray(i_ref))


def test_knn_pallas_k_wider_than_length():
    """Some clouds have lengths2 < K: pallas pads with inf which the public
    wrapper zeroes; compare pre-convention outputs against the XLA twin."""
    p1, p2, _ = _clouds(jax.random.PRNGKey(3), 2, 20, 10)
    l1 = jnp.full((2,), 20, jnp.int32)
    l2 = jnp.asarray([3, 10])
    d_pal, i_pal = knn_forward_pallas(
        p1, p2, l2, K=6, tile_p1=16, tile_p2=16, interpret=True
    )
    d_ref, i_ref = _knn_forward_full(p1, p2, l1, l2, 6, 2)
    # rows where k < lengths2 must agree; pallas uses inf beyond, full uses
    # padded junk beyond — compare only valid ks
    for n in range(2):
        kv = min(6, int(l2[n]))
        np.testing.assert_allclose(
            np.asarray(d_pal)[n, :, :kv], np.asarray(d_ref)[n, :, :kv], atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(i_pal)[n, :, :kv], np.asarray(i_ref)[n, :, :kv]
        )
        assert np.isinf(np.asarray(d_pal)[n, :, kv:]).all()


def test_fps_pallas_matches_xla():
    pts = jax.random.normal(jax.random.PRNGKey(0), (3, 50, 3))
    lengths = jnp.asarray([50, 30, 7])
    K = jnp.asarray([12, 12, 12])
    starts = jnp.asarray([0, 3, 0])
    idx_pal = fps_pallas(pts, lengths, K, starts, 12, interpret=True)
    idx_xla = jax.vmap(lambda p, l, k, s: _fps_single(p, l, k, s, 12))(
        pts, lengths, K, starts
    )
    np.testing.assert_array_equal(np.asarray(idx_pal), np.asarray(idx_xla))


def test_fps_pallas_per_cloud_k():
    pts = jax.random.normal(jax.random.PRNGKey(1), (2, 40, 3))
    lengths = jnp.asarray([40, 40])
    K = jnp.asarray([5, 9])
    starts = jnp.zeros((2,), jnp.int32)
    idx = np.asarray(fps_pallas(pts, lengths, K, starts, 9, interpret=True))
    assert (idx[0, 5:] == -1).all()
    assert (idx[0, :5] >= 0).all()
    assert (idx[1] >= 0).all()


def test_knn_pallas_folded_extraction():
    """tile_p2 > 256 exercises the hierarchical fold + watermark rounds
    (same-group second winners); exact parity incl. tie order."""
    p1, p2, l2 = _clouds(jax.random.PRNGKey(11), 1, 64, 2048)
    l1 = jnp.full((1,), 64, jnp.int32)
    d_pal, i_pal = knn_forward_pallas(
        p1, p2, l2, K=16, tile_p1=32, tile_p2=2048, interpret=True
    )
    d_ref, i_ref = _knn_forward_full(p1, p2, l1, l2, 16, 2)
    np.testing.assert_allclose(np.asarray(d_pal), np.asarray(d_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_pal), np.asarray(i_ref))


def test_knn_pallas_duplicate_points_ties():
    """Exact duplicates force distance ties across and within fold groups;
    indices must keep ascending order (first-seen-wins)."""
    key = jax.random.PRNGKey(12)
    base = jax.random.normal(key, (1, 128, 3), jnp.float32)
    p2 = jnp.concatenate([base, base, base, base], axis=1)  # every pt x4
    p1 = base[:, :32]
    l1 = jnp.full((1,), 32, jnp.int32)
    l2 = jnp.full((1,), 512, jnp.int32)
    d_pal, i_pal = knn_forward_pallas(
        p1, p2, l2, K=8, tile_p1=32, tile_p2=512, interpret=True
    )
    d_ref, i_ref = _knn_forward_full(p1, p2, l1, l2, 8, 2)
    np.testing.assert_allclose(np.asarray(d_pal), np.asarray(d_ref), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i_pal), np.asarray(i_ref))


def test_knn_pallas_shadowed_tie_at_kth_slot():
    """Directed regression: a tie candidate shadowed in phase 1 by a smaller
    same-fold-group value must still displace an equal-valued, HIGHER-index
    phase-1 winner when the tie lands exactly on the kth slot.

    Construction (GF=256 for tile_p2=2048): queries at the origin; lane 257
    (group 1) holds the group minimum 0.25 which shadows lane 1 (group 1,
    value 1.0); lane 258 (group 2) carries the same value 1.0; lane 259
    carries 0.5625 so that with K=3 the kth slot after phase 1 is exactly
    1.0@258 — the shadowed 1.0@1 must replace it (first-seen-wins)."""
    P2 = 2048
    x = np.full((P2,), 8.0, np.float32)  # background: squared dist 64
    x[257] = 0.5  # group 1 minimum (0.25) — shadows lane 1
    x[1] = 1.0  # the shadowed tie (1.0) with the LOWEST global index
    x[258] = 1.0  # equal-valued winner in group 2 (higher index)
    x[259] = 0.75  # 0.5625, fills the 2nd slot
    p2 = np.zeros((1, P2, 3), np.float32)
    p2[0, :, 0] = x
    p1 = jnp.zeros((1, 8, 3), jnp.float32)
    l1 = jnp.full((1,), 8, jnp.int32)
    l2 = jnp.full((1,), P2, jnp.int32)
    d_pal, i_pal = knn_forward_pallas(
        p1, jnp.asarray(p2), l2, K=3, tile_p1=8, tile_p2=2048, interpret=True
    )
    d_ref, i_ref = _knn_forward_full(p1, jnp.asarray(p2), l1, l2, 3, 2)
    np.testing.assert_array_equal(np.asarray(i_pal), np.asarray(i_ref))
    np.testing.assert_array_equal(np.asarray(i_pal)[0, 0], [257, 259, 1])
    np.testing.assert_allclose(np.asarray(d_pal), np.asarray(d_ref), atol=1e-6)


def test_ball_query_pallas_matches_xla():
    from pytorch3d_pointops_tpu.kernels.ball_query_pallas import (
        ball_query_forward_pallas,
    )
    from pytorch3d_pointops_tpu.ops.ball_query import _ball_query_forward

    p1, p2, l2 = _clouds(jax.random.PRNGKey(21), 2, 60, 700)
    l1 = jnp.asarray([60, 33], jnp.int32)
    idx_pal = ball_query_forward_pallas(
        p1, p2, l2, K=8, radius=0.8, tile_p1=32, tile_p2=512, interpret=True
    )
    # row masking applied by the wrapper; do it here for comparison
    iv = jnp.arange(60, dtype=jnp.int32)[None, :] < l1[:, None]
    idx_pal = jnp.where(iv[..., None], idx_pal, -1)
    d_ref, i_ref = _ball_query_forward(p1, p2, l1, l2, 8, 0.8, impl="xla")
    np.testing.assert_array_equal(np.asarray(idx_pal), np.asarray(i_ref))


def test_ball_query_pallas_wrapper_end_to_end():
    """The full ball_query op with impl='pallas' (interpret inside jit is
    not supported on CPU, so call the forward pieces directly)."""
    from pytorch3d_pointops_tpu.kernels.ball_query_pallas import (
        ball_query_forward_pallas,
    )
    from pytorch3d_pointops_tpu.ops.ball_query import _ball_query_forward

    p1, p2, l2 = _clouds(jax.random.PRNGKey(22), 2, 40, 300)
    l1 = jnp.full((2,), 40, jnp.int32)
    idx = ball_query_forward_pallas(
        p1, p2, l2, K=6, radius=1.0, tile_p1=16, tile_p2=256, interpret=True
    )
    d_ref, i_ref = _ball_query_forward(p1, p2, l1, l2, 6, 1.0, impl="xla")
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(i_ref))
    # distance recompute path
    N, P1, D = p1.shape
    P2 = p2.shape[1]
    safe = jnp.clip(idx, 0, P2 - 1)
    nn = jnp.take_along_axis(
        p2[:, :, None, :], safe.reshape(N, -1, 1, 1), axis=1
    ).reshape(N, P1, 6, D)
    dv = ((p1[:, :, None, :] - nn) ** 2).sum(-1)
    dv = jnp.where(idx >= 0, dv, 0.0)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(d_ref), atol=1e-5)


def test_ball_query_pallas_chained_rounds_large_k():
    """K > 64 chains rounds of the 64-key kernel with per-query lower
    bounds; results must match the XLA scan-order oracle exactly."""
    from pytorch3d_pointops_tpu.kernels.ball_query_pallas import (
        ball_query_forward_pallas,
    )
    from pytorch3d_pointops_tpu.ops.ball_query import _ball_query_forward

    p1, p2, l2 = _clouds(jax.random.PRNGKey(31), 2, 40, 900)
    l1 = jnp.full((2,), 40, jnp.int32)
    # radius large enough that many queries exhaust >64 neighbors and some
    # queries run dry mid-round (lb=inf path)
    idx_pal = ball_query_forward_pallas(
        p1, p2, l2, K=100, radius=1.5, tile_p1=16, tile_p2=256, interpret=True
    )
    _, i_ref = _ball_query_forward(p1, p2, l1, l2, 100, 1.5, impl="xla")
    np.testing.assert_array_equal(np.asarray(idx_pal), np.asarray(i_ref))


def test_ball_query_pallas_k_exceeds_small_p2():
    """K > _ROUND_K with _ROUND_K < P2 < K: chained rounds cover only
    rounds*64 < K keys, so the output must be inf-padded back to width K
    (advisor repro: K=200, P2=100 used to return a (N, P1, 128) idx)."""
    from pytorch3d_pointops_tpu.kernels.ball_query_pallas import (
        ball_query_forward_pallas,
    )
    from pytorch3d_pointops_tpu.ops.ball_query import _ball_query_forward

    p1, p2, l2 = _clouds(jax.random.PRNGKey(33), 2, 24, 100)
    l1 = jnp.full((2,), 24, jnp.int32)
    idx_pal = ball_query_forward_pallas(
        p1, p2, l2, K=200, radius=2.0, tile_p1=16, tile_p2=64, interpret=True
    )
    assert idx_pal.shape == (2, 24, 200)
    _, i_ref = _ball_query_forward(p1, p2, l1, l2, 200, 2.0, impl="xla")
    np.testing.assert_array_equal(np.asarray(idx_pal), np.asarray(i_ref))


def test_ball_query_pallas_large_k_tiny_p2_single_round():
    """P2 <= _ROUND_K with a huge K (the reference default K=500 on a small
    cloud) must still cap the per-round capacity at _ROUND_K — one 64-wide
    round covers every possible neighbor, and the output is padded to K
    (advisor: the uncapped Kc = K = 500 statically unrolled ~1000 insertion
    sweeps and could OOM the remote TPU compiler)."""
    from pytorch3d_pointops_tpu.kernels import ball_query_pallas as bqp
    from pytorch3d_pointops_tpu.ops.ball_query import _ball_query_forward

    p1, p2, l2 = _clouds(jax.random.PRNGKey(34), 2, 16, 40)
    l1 = jnp.full((2,), 16, jnp.int32)
    rounds_seen = []
    orig_round = bqp._bq_round

    def counting_round(p1_, p2t_, len2_, lb_, Kc, *args, **kw):
        rounds_seen.append(Kc)
        return orig_round(p1_, p2t_, len2_, lb_, Kc, *args, **kw)

    bqp._bq_round = counting_round
    try:
        idx_pal = bqp.ball_query_forward_pallas(
            p1, p2, l2, K=500, radius=2.0, tile_p1=16, tile_p2=64,
            interpret=True,
        )
    finally:
        bqp._bq_round = orig_round
    assert idx_pal.shape == (2, 16, 500)
    assert rounds_seen == [bqp._ROUND_K]  # one round, capacity capped at 64
    _, i_ref = _ball_query_forward(p1, p2, l1, l2, 500, 2.0, impl="xla")
    np.testing.assert_array_equal(np.asarray(idx_pal), np.asarray(i_ref))


def test_fps_pallas_batched_matches_xla():
    from pytorch3d_pointops_tpu.kernels.fps_pallas import fps_pallas_batched

    pts = jax.random.normal(jax.random.PRNGKey(4), (4, 60, 3))
    lengths = jnp.asarray([60, 33, 7, 60])
    K = jnp.asarray([12, 12, 12, 5])
    starts = jnp.asarray([0, 3, 0, 2])
    idx_b = fps_pallas_batched(pts, lengths, K, starts, 12, interpret=True)
    idx_xla = jax.vmap(lambda p, l, k, s: _fps_single(p, l, k, s, 12))(
        pts, lengths, K, starts
    )
    np.testing.assert_array_equal(np.asarray(idx_b), np.asarray(idx_xla))


def test_fps_pallas_dense8_large_unaligned():
    """P not a multiple of the 1024-point packing block exercises padding;
    the dense8 (8, P/8) index mapping must stay exact."""
    pts = jax.random.normal(jax.random.PRNGKey(6), (2, 1500, 3))
    lengths = jnp.asarray([1500, 1200])
    K = jnp.asarray([40, 40])
    starts = jnp.zeros((2,), jnp.int32)
    idx_pal = fps_pallas(pts, lengths, K, starts, 40, interpret=True)
    idx_xla = jax.vmap(lambda p, l, k, s: _fps_single(p, l, k, s, 40))(
        pts, lengths, K, starts
    )
    np.testing.assert_array_equal(np.asarray(idx_pal), np.asarray(idx_xla))


def test_knn_pallas_high_dim_mxu_path():
    """D > 8 routes the distance through the MXU |x|^2+|y|^2-2xy expansion
    in HIGHEST precision; parity must hold at 1e-4 (BASELINE bar)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(40))
    p1 = jax.random.normal(k1, (1, 64, 16), jnp.float32)
    p2 = jax.random.normal(k2, (1, 200, 16), jnp.float32)
    l1 = jnp.full((1,), 64, jnp.int32)
    l2 = jnp.full((1,), 200, jnp.int32)
    d_pal, i_pal = knn_forward_pallas(
        p1, p2, l2, K=8, tile_p1=32, tile_p2=64, interpret=True
    )
    d_ref, i_ref = _knn_forward_full(p1, p2, l1, l2, 8, 2)
    np.testing.assert_allclose(
        np.asarray(d_pal), np.asarray(d_ref), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(i_pal), np.asarray(i_ref))


def test_knn_pallas_zero_length_cloud():
    """A cloud with lengths2 == 0 must produce all-inf pre-convention output
    (the wrapper zeroes it); no nans, no garbage indices escaping."""
    p1, p2, _ = _clouds(jax.random.PRNGKey(41), 2, 16, 64)
    l2 = jnp.asarray([0, 64], jnp.int32)
    d_pal, i_pal = knn_forward_pallas(
        p1, p2, l2, K=4, tile_p1=16, tile_p2=64, interpret=True
    )
    assert np.isinf(np.asarray(d_pal)[0]).all()
    # full cloud still exact
    l1 = jnp.full((2,), 16, jnp.int32)
    d_ref, i_ref = _knn_forward_full(p1, p2, l1, l2, 4, 2)
    np.testing.assert_array_equal(np.asarray(i_pal)[1], np.asarray(i_ref)[1])
    # public wrapper applies the reference pad conventions end to end
    from pytorch3d_pointops_tpu.ops.knn import knn_points

    out = knn_points(p1, p2, l1, l2, K=4)
    assert (np.asarray(out.dists)[0] == 0).all()
    assert (np.asarray(out.idx)[0] == 0).all()


def test_knn_pallas_chain_split_width():
    """tile_p1=256 on the production kernel splits into 2x128 chains; the
    de-interleave must reassemble query order exactly."""
    p1, p2, l2 = _clouds(jax.random.PRNGKey(42), 1, 300, 500)
    l1 = jnp.full((1,), 300, jnp.int32)
    d_pal, i_pal = knn_forward_pallas(
        p1, p2, l2, K=8, tile_p1=256, tile_p2=256, interpret=True
    )
    d_ref, i_ref = _knn_forward_full(p1, p2, l1, l2, 8, 2)
    np.testing.assert_allclose(np.asarray(d_pal), np.asarray(d_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_pal), np.asarray(i_ref))


def test_knn_pallas_huge_finite_distances():
    """Squared distances in (3e38, f32max) stay admissible in the phase-2
    survivor screen (regression for the former 3e38 threshold clamp): the
    unfull-state threshold transform must admit every FINITE distance."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(43))
    p1 = jax.random.normal(k1, (1, 64, 3), jnp.float32)
    p2 = jax.random.normal(k2, (1, 600, 3), jnp.float32) * 1.04e19
    l1 = jnp.full((1,), 64, jnp.int32)
    l2 = jnp.full((1,), 600, jnp.int32)
    d_p, i_p = knn_forward_pallas(
        p1, p2, l2, K=8, tile_p1=32, tile_p2=512, interpret=True
    )
    d_r, i_r = _knn_forward_full(p1, p2, l1, l2, 8, 2)
    assert np.isfinite(np.asarray(d_r)).any()  # the band is actually hit
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_r))


def test_fps_pallas_chunked_matches_xla():
    """The HBM-streaming chunked FPS (clouds past the dense8 VMEM cap) must
    reproduce exact index parity incl. cross-chunk argmax tie-breaks; small
    chunk_points forces multiple chunks here."""
    from pytorch3d_pointops_tpu.kernels.fps_pallas import fps_pallas_chunked

    pts = jax.random.normal(jax.random.PRNGKey(8), (2, 3000, 3))
    lengths = jnp.asarray([3000, 2100])
    K = jnp.asarray([25, 13])
    starts = jnp.asarray([0, 7])
    idx_c = fps_pallas_chunked(
        pts, lengths, K, starts, 25, chunk_points=1024, interpret=True
    )
    idx_x = jax.vmap(lambda p, l, k, s: _fps_single(p, l, k, s, 25))(
        pts, lengths, K, starts
    )
    np.testing.assert_array_equal(np.asarray(idx_c), np.asarray(idx_x))
    # quantized coords: exact distance ties straddling chunk boundaries
    ptsq = jax.random.randint(
        jax.random.PRNGKey(9), (1, 2600, 3), 0, 4
    ).astype(jnp.float32)
    lq = jnp.asarray([2500])
    Kq = jnp.asarray([40])
    sq = jnp.asarray([3])
    ic = fps_pallas_chunked(
        ptsq, lq, Kq, sq, 40, chunk_points=1024, interpret=True
    )
    ix = jax.vmap(lambda p, l, k, s: _fps_single(p, l, k, s, 40))(
        ptsq, lq, Kq, sq
    )
    np.testing.assert_array_equal(np.asarray(ic), np.asarray(ix))


def test_knn_pallas_auto_tile_no_wide_single_chain():
    """P1 bands where no low-waste chain tile exists (e.g. 520) must fall
    back to a 128-multiple tile, not a >512-lane single chain (the Mosaic
    cliff class); correctness stays exact through the padding."""
    p1, p2, l2 = _clouds(jax.random.PRNGKey(55), 1, 520, 256)
    l1 = jnp.full((1,), 520, jnp.int32)
    d_pal, i_pal = knn_forward_pallas(p1, p2, l2, K=4, interpret=True)
    d_ref, i_ref = _knn_forward_full(p1, p2, l1, l2, 4, 2)
    np.testing.assert_allclose(np.asarray(d_pal), np.asarray(d_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_pal), np.asarray(i_ref))


# ---- fused bidirectional chamfer NN kernel ----


@pytest.mark.parametrize("norm", [1, 2])
def test_chamfer_bidir_kernel_matches_composed(norm):
    """One fused pass must equal two composed K=1 KNN forwards in both
    directions: dists allclose, indices exact (incl. ragged lengths)."""
    from pytorch3d_pointops_tpu.kernels.chamfer_pallas import (
        chamfer_nn_bidirectional_pallas,
    )

    p1, p2, l2 = _clouds(jax.random.PRNGKey(norm + 20), 3, 130, 70)
    l1 = jnp.asarray([130, 60, 1], jnp.int32)
    d1, i1, d2, i2 = chamfer_nn_bidirectional_pallas(
        p1, p2, l1, l2, norm, tile_p1=32, tile_p2=128, interpret=True
    )
    rd1, ri1 = _knn_forward_full(p1, p2, l1, l2, 1, norm)
    rd2, ri2 = _knn_forward_full(p2, p1, l2, l1, 1, norm)
    for n in range(3):
        v1, v2 = int(l1[n]), int(l2[n])
        np.testing.assert_allclose(
            np.asarray(d1[n, :v1]), np.asarray(rd1[n, :v1, 0]), atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(i1[n, :v1]), np.asarray(ri1[n, :v1, 0])
        )
        np.testing.assert_allclose(
            np.asarray(d2[n, :v2]), np.asarray(rd2[n, :v2, 0]), atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(i2[n, :v2]), np.asarray(ri2[n, :v2, 0])
        )


def test_chamfer_bidir_kernel_tie_stress():
    """Duplicate points create exact distance ties within AND across tiles;
    both directions must keep the LOWEST index (first-seen-wins,
    mink.cuh:62-83) through the cross-tile strict-< merges."""
    from pytorch3d_pointops_tpu.kernels.chamfer_pallas import (
        chamfer_nn_bidirectional_pallas,
    )

    rng = np.random.default_rng(11)
    x = jnp.asarray(
        np.repeat(rng.normal(size=(1, 20, 3)).astype(np.float32), 3, axis=1)
    )
    y = jnp.asarray(
        np.repeat(rng.normal(size=(1, 15, 3)).astype(np.float32), 4, axis=1)
    )
    l1 = jnp.asarray([60], jnp.int32)
    l2 = jnp.asarray([60], jnp.int32)
    d1, i1, d2, i2 = chamfer_nn_bidirectional_pallas(
        x, y, l1, l2, 2, tile_p1=16, tile_p2=128, interpret=True
    )
    _, ri1 = _knn_forward_full(x, y, l1, l2, 1, 2)
    _, ri2 = _knn_forward_full(y, x, l2, l1, 1, 2)
    np.testing.assert_array_equal(np.asarray(i1[0]), np.asarray(ri1[0, :, 0]))
    np.testing.assert_array_equal(np.asarray(i2[0]), np.asarray(ri2[0, :, 0]))


def test_knn_pallas_chained_big_k():
    """K > 64 chains 64-key rounds with lexicographic lower bounds; the
    concatenation must equal the global ascending order exactly, including
    on tie-heavy quantized data where round boundaries split tie groups."""
    rng = np.random.default_rng(0)
    p1 = jnp.asarray(rng.integers(0, 3, size=(2, 50, 3)).astype(np.float32))
    p2 = jnp.asarray(rng.integers(0, 3, size=(2, 300, 3)).astype(np.float32))
    l1 = jnp.asarray([50, 50], jnp.int32)
    l2 = jnp.asarray([300, 170], jnp.int32)
    d, i = knn_forward_pallas(
        p1, p2, l2, K=100, tile_p1=32, tile_p2=128, interpret=True
    )
    rd, ri = _knn_forward_full(p1, p2, l1, l2, 100, 2)
    for n in range(2):
        kv = min(100, int(l2[n]))
        np.testing.assert_allclose(
            np.asarray(d[n, :, :kv]), np.asarray(rd[n, :, :kv]), atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(i[n, :, :kv]), np.asarray(ri[n, :, :kv])
        )


def test_knn_pallas_chained_round_k_sizes():
    """round_k parametrizes the per-round capacity of the chained big-K
    path (wider rounds stream the distance matrix fewer times).  Any
    round_k must reproduce the exact global ascending (value, index) order,
    including a round_k that does NOT divide K and a single-round
    round_k >= K, on tie-heavy quantized data."""
    rng = np.random.default_rng(7)
    p1 = jnp.asarray(rng.integers(0, 3, size=(1, 40, 3)).astype(np.float32))
    p2 = jnp.asarray(rng.integers(0, 3, size=(1, 300, 3)).astype(np.float32))
    l1 = jnp.asarray([40], jnp.int32)
    l2 = jnp.asarray([260], jnp.int32)
    rd, ri = _knn_forward_full(p1, p2, l1, l2, 150, 2)
    for round_k in (48, 128, 160):
        d, i = knn_forward_pallas(
            p1, p2, l2, K=150, tile_p1=32, tile_p2=128, interpret=True,
            round_k=round_k,
        )
        np.testing.assert_allclose(
            np.asarray(d[0]), np.asarray(rd[0]), atol=1e-5,
            err_msg=f"round_k={round_k}",
        )
        np.testing.assert_array_equal(
            np.asarray(i[0]), np.asarray(ri[0]), err_msg=f"round_k={round_k}"
        )


def test_knn_pallas_chained_big_k_norm1():
    """L1 norm through the chained big-K path: the per-round lexicographic
    (value, index) bounds must chunk the ascending L1 order exactly —
    integer coords make every |diff| sum collide, so round boundaries land
    inside tie groups."""
    rng = np.random.default_rng(3)
    p1 = jnp.asarray(rng.integers(0, 3, size=(1, 40, 3)).astype(np.float32))
    p2 = jnp.asarray(rng.integers(0, 3, size=(1, 300, 3)).astype(np.float32))
    l1 = jnp.asarray([40], jnp.int32)
    l2 = jnp.asarray([280], jnp.int32)
    d, i = knn_forward_pallas(
        p1, p2, l2, K=100, norm=1, tile_p1=32, tile_p2=128, interpret=True
    )
    rd, ri = _knn_forward_full(p1, p2, l1, l2, 100, 1)
    np.testing.assert_allclose(np.asarray(d[0]), np.asarray(rd[0]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i[0]), np.asarray(ri[0]))


def test_knn_pallas_chained_k_exceeds_p2():
    """K > P2: rounds are capped at ceil(P2/64) and the tail carries the
    kernel's (inf, 0) fill for the caller's pad conventions to zero."""
    rng = np.random.default_rng(1)
    p1 = jnp.asarray(rng.normal(size=(1, 40, 3)).astype(np.float32))
    p2 = jnp.asarray(rng.normal(size=(1, 120, 3)).astype(np.float32))
    l1 = jnp.asarray([40], jnp.int32)
    l2 = jnp.asarray([120], jnp.int32)
    d, i = knn_forward_pallas(
        p1, p2, l2, K=150, tile_p1=32, tile_p2=64, interpret=True
    )
    rd, ri = _knn_forward_full(p1, p2, l1, l2, 150, 2)
    np.testing.assert_allclose(
        np.asarray(d[0, :, :120]), np.asarray(rd[0, :, :120]), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(i[0, :, :120]), np.asarray(ri[0, :, :120])
    )
    assert bool(jnp.isinf(d[0, :, 120:]).all())


def test_chamfer_bidir_kernel_multi_tile_grid():
    """nI > 1 AND nJ > 1 (the 4D y-output block layout): regression for the
    Mosaic block-shape rule a (1, 1, T2)-over-(N, nJ, T2) spec violated
    whenever nJ > 1."""
    from pytorch3d_pointops_tpu.kernels.chamfer_pallas import (
        chamfer_nn_bidirectional_pallas,
    )

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 300, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(2, 600, 3)).astype(np.float32))
    l1 = jnp.asarray([300, 293], jnp.int32)
    l2 = jnp.asarray([600, 469], jnp.int32)
    d1, i1, d2, i2 = chamfer_nn_bidirectional_pallas(
        x, y, l1, l2, 2, tile_p1=64, tile_p2=128, interpret=True
    )
    rd1, ri1 = _knn_forward_full(x, y, l1, l2, 1, 2)
    rd2, ri2 = _knn_forward_full(y, x, l2, l1, 1, 2)
    for n in range(2):
        v1, v2 = int(l1[n]), int(l2[n])
        np.testing.assert_allclose(
            np.asarray(d1[n, :v1]), np.asarray(rd1[n, :v1, 0]), atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(i1[n, :v1]), np.asarray(ri1[n, :v1, 0])
        )
        np.testing.assert_allclose(
            np.asarray(d2[n, :v2]), np.asarray(rd2[n, :v2, 0]), atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(i2[n, :v2]), np.asarray(ri2[n, :v2, 0])
        )


def test_scatter_add_k1_matches_oracle():
    """The MXU one-hot segment-sum must equal a numpy scatter exactly on
    structure (1e-5 on sums); -1 targets contribute nothing."""
    from pytorch3d_pointops_tpu.kernels.chamfer_pallas import (
        scatter_add_k1_pallas,
    )

    rng = np.random.default_rng(0)
    for (N, P1, P2, C) in [(2, 300, 200, 3), (1, 50, 600, 1), (3, 128, 128, 8)]:
        idx = rng.integers(-1, P2, size=(N, P1)).astype(np.int32)
        contrib = rng.normal(size=(N, P1, C)).astype(np.float32)
        contrib[idx < 0] = 0.0
        out = scatter_add_k1_pallas(
            jnp.asarray(idx), jnp.asarray(contrib), P2,
            tile_p1=64, tile_p2=128, interpret=True,
        )
        ref = np.zeros((N, P2, C), np.float32)
        for n in range(N):
            for p in range(P1):
                if idx[n, p] >= 0:
                    ref[n, idx[n, p]] += contrib[n, p]
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


@pytest.mark.parametrize("depth", [1, 2, 3, 4])
@pytest.mark.parametrize("regime", ["rand", "quant", "dup"])
def test_knn_pallas_fold_depths(depth, regime):
    """Every fold depth must give exact (value, index) parity — including on
    quantized and duplicated clouds where the depth-d merge networks and the
    per-level row recovery exclusions (exact value ties) all fire.  Auto
    dispatch ships depth 3 for K > 16; depth 4 stays covered as the measured
    -but-rejected variant."""
    rng = np.random.default_rng(20 + depth)
    if regime == "rand":
        a = rng.normal(size=(2, 100, 3))
        b = rng.normal(size=(2, 300, 3))
        K = 8
    elif regime == "quant":
        a = rng.integers(0, 2, size=(1, 64, 3))
        b = rng.integers(0, 2, size=(1, 512, 3))
        K = 16
    else:
        base = rng.normal(size=(1, 40, 3)).astype(np.float32)
        a = np.repeat(base, 2, axis=1)[:, :64]
        b = np.repeat(base, 5, axis=1)[:, :160]
        K = 6
    p1 = jnp.asarray(np.asarray(a, np.float32))
    p2 = jnp.asarray(np.asarray(b, np.float32))
    N, P1 = p1.shape[:2]
    P2 = p2.shape[1]
    l1 = jnp.full((N,), P1, jnp.int32)
    l2 = jnp.asarray([P2 - 13 * i for i in range(N)], jnp.int32)
    d_pal, i_pal = knn_forward_pallas(
        p1, p2, l2, K, 2, tile_p1=32, tile_p2=64, interpret=True, depth=depth
    )
    d_ref, i_ref = _knn_forward_full(p1, p2, l1, l2, K, 2)
    np.testing.assert_allclose(np.asarray(d_pal), np.asarray(d_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_pal), np.asarray(i_ref))


def test_knn_pallas_seeded_single_round_exact_kth_bound():
    """A per-query ub equal to the EXACT kth distance (ties included) must
    give exact (value, index) parity: the bound is inclusive, so d == ub
    candidates are admitted and the sentinel-seeded state fills fully."""
    rng = np.random.default_rng(31)
    p1 = jnp.asarray(rng.integers(0, 3, size=(2, 40, 3)).astype(np.float32))
    p2 = jnp.asarray(rng.integers(0, 3, size=(2, 200, 3)).astype(np.float32))
    l1 = jnp.asarray([40, 40], jnp.int32)
    l2 = jnp.asarray([200, 150], jnp.int32)
    K = 8
    d_ref, i_ref = _knn_forward_full(p1, p2, l1, l2, K, 2)
    # The bound must be in the KERNEL's own distance numerics (the oracle's
    # kth can sit one ulp below the kernel's) — production bounds come from
    # a sample pass through this same kernel, which is bit-consistent.
    d_un, i_un = knn_forward_pallas(
        p1, p2, l2, K=K, tile_p1=32, tile_p2=64, interpret=True
    )
    ub = d_un[..., K - 1]  # exact kth: the tightest valid inclusive bound
    d, i = knn_forward_pallas(
        p1, p2, l2, K=K, tile_p1=32, tile_p2=64, interpret=True, ub=ub
    )
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d_un))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_un))
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_knn_pallas_seeded_too_tight_bound_leaves_sentinels():
    """The raw kernel contract for a too-tight ub: slots that could not fill
    keep (nextafter(ub), _SENT) so callers can detect and rerun.  Entries
    below the bound are still the exact prefix of the true result."""
    from pytorch3d_pointops_tpu.kernels.knn_pallas import _SENT

    rng = np.random.default_rng(32)
    p1 = jnp.asarray(rng.normal(size=(1, 24, 3)).astype(np.float32))
    p2 = jnp.asarray(rng.normal(size=(1, 120, 3)).astype(np.float32))
    l1 = jnp.asarray([24], jnp.int32)
    l2 = jnp.asarray([120], jnp.int32)
    K = 8
    d_ref, i_ref = knn_forward_pallas(
        p1, p2, l2, K=K, tile_p1=8, tile_p2=64, interpret=True
    )  # kernel-numerics reference (see the exact-kth test above)
    cut = 4  # bound at the 4th distance: exactly 4 slots can fill
    ub = d_ref[..., cut - 1]
    d, i = knn_forward_pallas(
        p1, p2, l2, K=K, tile_p1=8, tile_p2=64, interpret=True, ub=ub
    )
    d, i, d_ref, i_ref = map(np.asarray, (d, i, d_ref, i_ref))
    np.testing.assert_allclose(d[..., :cut], d_ref[..., :cut], atol=1e-5)
    np.testing.assert_array_equal(i[..., :cut], i_ref[..., :cut])
    assert np.all(i[..., cut:] == _SENT)
    seed = np.maximum(
        np.nextafter(
            np.asarray(ub, np.float32)[..., None], np.float32(np.inf)
        ),
        np.float32(np.finfo(np.float32).tiny),
    )
    np.testing.assert_array_equal(
        d[..., cut:], np.broadcast_to(seed, d[..., cut:].shape)
    )


def test_knn_pallas_bigk_sampled_bounds_parity():
    """The sampled-bound big-K path (auto for large P2; forced small here
    via sample_s) must be exactly the unfiltered chained order, on
    tie-heavy quantized data with a mixed batch: one full cloud (filtered),
    one below the len_eff gate (per-cloud filter disabled)."""
    rng = np.random.default_rng(33)
    p1 = jnp.asarray(rng.integers(0, 4, size=(2, 40, 3)).astype(np.float32))
    p2 = jnp.asarray(
        rng.integers(0, 4, size=(2, 2048, 3)).astype(np.float32)
    )
    l1 = jnp.asarray([40, 40], jnp.int32)
    l2 = jnp.asarray([2048, 700], jnp.int32)  # 700 < P2//2: filter disabled
    K = 100
    d_ref, i_ref = _knn_forward_full(p1, p2, l1, l2, K, 2)
    d, i = knn_forward_pallas(
        p1, p2, l2, K=K, tile_p1=32, tile_p2=256, interpret=True,
        sample_s=256,
    )
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_knn_pallas_bigk_sampled_bounds_norm1():
    """L1 big-K through the sampled-bound path: bound numerics must match
    the main pass's L1 accumulation exactly."""
    rng = np.random.default_rng(34)
    p1 = jnp.asarray(rng.normal(size=(1, 30, 3)).astype(np.float32))
    p2 = jnp.asarray(rng.normal(size=(1, 1536, 3)).astype(np.float32))
    l1 = jnp.asarray([30], jnp.int32)
    l2 = jnp.asarray([1536], jnp.int32)
    K = 80
    d_ref, i_ref = _knn_forward_full(p1, p2, l1, l2, K, 1)
    d, i = knn_forward_pallas(
        p1, p2, l2, K=K, norm=1, tile_p1=32, tile_p2=256, interpret=True,
        sample_s=256,
    )
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_knn_pallas_bigk_sampled_fallback_repairs_bad_bounds(monkeypatch):
    """If every sampled bound is absurdly tight, sentinel detection must
    trigger the unfiltered rerun and the final result stays exact."""
    from pytorch3d_pointops_tpu.kernels import knn_pallas as kp

    def bad_bounds(p1, p2, lengths2, kqs, norm, s, interpret, tp1, tp2):
        N, P1, _ = p1.shape
        return [jnp.full((N, P1), -1.0, jnp.float32) for _ in kqs]

    monkeypatch.setattr(kp, "_bigk_round_bounds", bad_bounds)
    rng = np.random.default_rng(35)
    # P1=41 keeps the jit cache from reusing an unpatched trace.
    p1 = jnp.asarray(rng.normal(size=(1, 41, 3)).astype(np.float32))
    p2 = jnp.asarray(rng.normal(size=(1, 1024, 3)).astype(np.float32))
    l1 = jnp.asarray([41], jnp.int32)
    l2 = jnp.asarray([1024], jnp.int32)
    K = 100
    d_ref, i_ref = _knn_forward_full(p1, p2, l1, l2, K, 2)
    d, i = kp.knn_forward_pallas(
        p1, p2, l2, K=K, tile_p1=32, tile_p2=256, interpret=True,
        sample_s=256,
    )
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_knn_pallas_single_round_sample_bound_opt_in():
    """sample_bound=True on a K <= 64 call seeds the single round from a
    sampled bound (the headline-config optimization): exact parity."""
    rng = np.random.default_rng(36)
    p1 = jnp.asarray(rng.normal(size=(1, 33, 3)).astype(np.float32))
    p2 = jnp.asarray(rng.normal(size=(1, 1280, 3)).astype(np.float32))
    l1 = jnp.asarray([33], jnp.int32)
    l2 = jnp.asarray([1280], jnp.int32)
    K = 16
    d_ref, i_ref = _knn_forward_full(p1, p2, l1, l2, K, 2)
    d, i = knn_forward_pallas(
        p1, p2, l2, K=K, tile_p1=32, tile_p2=256, interpret=True,
        sample_bound=True, sample_s=256,
    )
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_knn_sorted_queries_exact_parity():
    """Morton query sorting (kernels/spatial_sort.py) permutes only the
    computation order: dists/idx must match the unsorted kernel EXACTLY —
    including tie order on duplicated points, ragged lengths, N > 1,
    chained big-K, and L1."""
    from pytorch3d_pointops_tpu.kernels.knn_pallas import knn_forward_pallas
    from pytorch3d_pointops_tpu.ops.knn import _knn_forward_full

    key = jax.random.PRNGKey(5)
    base = jax.random.normal(key, (2, 256, 3), jnp.float32)
    p2 = jnp.concatenate([base, base], axis=1)  # exact duplicates
    p1 = base[:, :128]
    l1 = jnp.full((2,), 128, jnp.int32)
    l2 = jnp.asarray([512 - 3, 500], jnp.int32)
    for K, norm in ((8, 2), (16, 2), (4, 1)):
        d_s, i_s = knn_forward_pallas(
            p1, p2, l2, K=K, norm=norm, tile_p1=32, tile_p2=128,
            interpret=True, sort_queries=True,
        )
        d_r, i_r = _knn_forward_full(p1, p2, l1, l2, K, norm)
        np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_r), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_r))
    # Chained big-K: one outer sort covers every round.
    d_s, i_s = knn_forward_pallas(
        p1[:1], p2[:1], l2[:1], K=100, tile_p1=32, tile_p2=128,
        interpret=True, sort_queries=True,
    )
    d_r, i_r = _knn_forward_full(p1[:1], p2[:1], l1[:1], l2[:1], 100, 2)
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_r), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_r))


def test_morton_argsort_roundtrip():
    """morton_argsort's (order, inverse) must be mutually inverse and
    stable for duplicate codes; D > 3 uses the first three axes."""
    from pytorch3d_pointops_tpu.kernels.spatial_sort import morton_argsort

    k = jax.random.PRNGKey(9)
    for D in (2, 3, 5):
        p = jax.random.normal(k, (2, 200, D), jnp.float32)
        p = p.at[:, 50:60].set(p[:, 40:50])  # duplicate coordinate runs
        order, inverse = morton_argsort(p)
        ps = jnp.take_along_axis(p, order[..., None], axis=1)
        back = jnp.take_along_axis(ps, inverse[..., None], axis=1)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(p))
        for n in range(2):
            assert sorted(np.asarray(order[n]).tolist()) == list(range(200))


def test_scatter_add_rows_matches_oracle():
    """The banked VMEM row scatter (KNN backward's grad_p2 segment-sum) must
    equal a numpy scatter; -1 targets contribute nothing; duplicate targets
    accumulate; rows past chunk padding never leak."""
    from pytorch3d_pointops_tpu.kernels.scatter_pallas import (
        scatter_add_rows_pallas,
    )

    rng = np.random.default_rng(1)
    for (N, E, P2, C, chunk, banks) in [
        (2, 500, 300, 3, 128, 4),
        (1, 64, 2000, 1, 32, 2),
        (3, 257, 100, 8, 64, 4),  # heavy duplication: E >> P2
    ]:
        idx = rng.integers(-1, P2, size=(N, E)).astype(np.int32)
        contrib = rng.normal(size=(N, E, C)).astype(np.float32)
        contrib[idx < 0] = 0.0
        out = scatter_add_rows_pallas(
            jnp.asarray(idx), jnp.asarray(contrib), P2,
            chunk=chunk, banks=banks, interpret=True,
        )
        ref = np.zeros((N, P2, C), np.float32)
        for n in range(N):
            for e in range(E):
                if idx[n, e] >= 0:
                    ref[n, idx[n, e]] += contrib[n, e]
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_scatter_add_rows_multi_page_and_determinism():
    """Targets spanning several (8, 128) pages land on the right rows, and
    two runs are bit-identical (the determinism contract that replaces the
    CUDA atomicAdd nondeterminism, knn.cu:537-538)."""
    from pytorch3d_pointops_tpu.kernels.scatter_pallas import (
        scatter_add_rows_pallas,
    )

    rng = np.random.default_rng(2)
    N, E, P2, C = 1, 400, 5000, 3  # 5 pages
    idx = rng.integers(0, P2, size=(N, E)).astype(np.int32)
    # Force known collisions on a cross-page boundary row.
    idx[0, :10] = 1024
    contrib = rng.normal(size=(N, E, C)).astype(np.float32)
    a = scatter_add_rows_pallas(
        jnp.asarray(idx), jnp.asarray(contrib), P2, interpret=True
    )
    b = scatter_add_rows_pallas(
        jnp.asarray(idx), jnp.asarray(contrib), P2, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ref = np.zeros((N, P2, C), np.float32)
    for e in range(E):
        ref[0, idx[0, e]] += contrib[0, e]
    np.testing.assert_allclose(np.asarray(a), ref, atol=1e-4)


def test_scatter_add_rows_chunk_not_banks_multiple():
    """A caller-supplied chunk that is not a banks multiple must not drop
    the tail entries of each grid step (regression: chunk=100/banks=8 lost
    12 contributions per chunk before the round-up); multi-step odd chunks
    round to the 128-divisible Mosaic block size."""
    from pytorch3d_pointops_tpu.kernels.scatter_pallas import (
        scatter_add_rows_pallas,
    )

    rng = np.random.default_rng(3)
    for (N, E, P2, C, chunk, banks) in [
        (1, 300, 50, 1, 100, 8),   # single-step after coercion
        (2, 5000, 64, 2, 1000, 8),  # multi-step, chunk not 128-divisible
        (1, 333, 40, 3, 7, 4),      # chunk < banks
    ]:
        idx = rng.integers(-1, P2, size=(N, E)).astype(np.int32)
        contrib = rng.normal(size=(N, E, C)).astype(np.float32)
        contrib[idx < 0] = 0.0
        out = scatter_add_rows_pallas(
            jnp.asarray(idx), jnp.asarray(contrib), P2,
            chunk=chunk, banks=banks, interpret=True,
        )
        ref = np.zeros((N, P2, C), np.float32)
        for n in range(N):
            for e in range(E):
                if idx[n, e] >= 0:
                    ref[n, idx[n, e]] += contrib[n, e]
        np.testing.assert_allclose(
            np.asarray(out), ref, atol=1e-4,
            err_msg=f"chunk={chunk} banks={banks}",
        )


def test_scatter_add_rows_dispatcher_capacity():
    """scatter_add_rows (the single dispatch policy for knn/chamfer/ring
    backwards) must fall back to the XLA scatter — not raise — when the
    accumulator exceeds the kernel's C-scaled VMEM capacity."""
    from pytorch3d_pointops_tpu.kernels.scatter_pallas import (
        scatter_add_rows,
        scatter_rows_fits,
    )

    # Capacity scales with channel count: ~7.69M rows at C=3, ~2.88M at C=8.
    assert scatter_rows_fits(7_000_000, 3)
    assert not scatter_rows_fits(8_000_000, 3)
    assert not scatter_rows_fits(3_000_000, 8)
    assert not scatter_rows_fits(100, 9)  # C > 8 unsupported by the kernel

    rng = np.random.default_rng(4)
    N, E, P2, C = 2, 64, 30, 8
    idx = rng.integers(-1, P2, size=(N, E)).astype(np.int32)
    contrib = rng.normal(size=(N, E, C)).astype(np.float32)
    out = scatter_add_rows(jnp.asarray(idx), jnp.asarray(contrib), P2)
    ref = np.zeros((N, P2, C), np.float32)
    for n in range(N):
        for e in range(E):
            if idx[n, e] >= 0:
                ref[n, idx[n, e]] += contrib[n, e]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_knn_instrument_counters_consistent():
    """instrument=True must not change results, and the counters must
    satisfy the structural invariants (tiles per block = grid depth,
    winning <= tiles, sweeps >= winning, firings <= winning)."""
    from pytorch3d_pointops_tpu.kernels.knn_pallas import _COUNTER_LANES

    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    N, P1, P2, K = 2, 64, 256, 8
    p1 = jax.random.normal(k1, (N, P1, 3), jnp.float32)
    p2 = jax.random.normal(k2, (N, P2, 3), jnp.float32)
    l2 = jnp.asarray([P2, P2 - 37], jnp.int32)
    d0, i0 = knn_forward_pallas(
        p1, p2, l2, K=K, tile_p1=32, tile_p2=64, interpret=True
    )
    d1, i1, cnt = knn_forward_pallas(
        p1, p2, l2, K=K, tile_p1=32, tile_p2=64, interpret=True,
        instrument=True,
    )
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    c = np.asarray(cnt)[:, :, 0, :]  # (N, nb, 128)
    L = _COUNTER_LANES
    nJ = P2 // 64
    assert (c[:, :, L["tiles"]] == nJ).all()
    assert (c[:, :, L["winning_tiles"]] <= c[:, :, L["tiles"]]).all()
    assert (c[:, :, L["p1_sweeps"]] >= c[:, :, L["winning_tiles"]]).all()
    assert (c[:, :, L["p2_firings"]] <= c[:, :, L["winning_tiles"]]).all()
    assert (c[:, :, L["p2_sweeps"]] <= K * c[:, :, L["p2_firings"]]).all()
    # Every query admits at least K candidates overall (P2 >= K here), so
    # each block's admissions must be >= K (they are summed over lanes).
    assert (c[:, :, L["admissions"]] >= K).all()
