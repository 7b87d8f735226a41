"""Deterministic row scatter-add (segment-sum) Pallas kernel for TPU.

The KNN backward must reduce N*P1*K gradient contributions into the P2
reference points (the CUDA kernel uses nondeterministic ``atomicAdd``,
csrc/knn/knn.cu:514-517).  The XLA scatter is deterministic but
update-serialized: measured 983 ms for 16M contributions at 1M x 1M / K=16
against ~5 ms of useful HBM traffic (ROOFLINE.md backward study), and the
K=1 one-hot-matmul trick (kernels/chamfer_pallas.py scatter_add_k1_pallas)
is O(P1*K*P2*C) — 16x the forward's FLOPs at K=16 (rejected in the round-4
tradeoff study).

This kernel is O(E) like a real scatter, with the accumulator resident in
VMEM so every update is a register-speed read-modify-write instead of an
XLA loop iteration:

* The accumulator covers ALL P2 rows in VMEM, laid out as pages of (8, 128):
  row q lives at (page = q >> 10, sublane = (q >> 7) & 7, lane = q & 127).
  One f32 channel costs 4 B/row — 4 MB per bank at P2 = 1M.
* Each entry is ONE dynamic-page (8, 128) read-modify-write per channel: a
  one-hot (sublane, lane) mask selects the cell, built from two iota
  compares against SMEM-resident scalars.  No atomics are needed because
  the grid's entry dimension is sequential ("arbitrary").
* ``B`` independent accumulator BANKS break the read-after-write dependency
  chain between consecutive entries (bank = entry index mod B): Mosaic
  cannot disambiguate dynamic pages, so a single accumulator would
  serialize every update at full load-use latency; banks give the VLIW
  scheduler B independent chains (the same trick as the KNN forward's
  multi-chain states).  The final bank sum is a fixed-order XLA reduction.
* Entries stream through the grid in fixed order and banks partition by
  entry index, so the result is bit-deterministic run to run.

Indices and contributions arrive through SMEM blocks (scalar loads feed the
address computation); negative indices contribute nothing (callers also
zero their contribution rows — both guards are kept).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

# Entries per grid step (SMEM block: 4 B/idx + 4 B/channel) and RMW banks.
# Swept on v5e (scripts/bench_scatter.py): at 1M rows banks 4 -> 8 is
# 194 -> 182 ms (11.4 ns/entry, 5.5x the XLA scatter); at 100k rows banks
# 16 is best net of RTT.  banks=None auto-sizes to the largest power of two
# whose accumulators fit the VMEM budget.
DEFAULT_CHUNK = 2048
DEFAULT_BANKS = None
_MAX_BANKS = 16
_VMEM_BUDGET = 88 * 1024 * 1024


def scatter_rows_fits(P2: int, C: int) -> bool:
    """True when ONE accumulator bank for (P2 rows, C channels) fits the
    kernel's VMEM budget — the capacity cap scales with C (e.g. ~7.69M rows
    at C=3 but ~2.88M at C=8), so callers must not hard-code a row count."""
    return C <= 8 and -(-P2 // 1024) * 1024 * 4 * C <= _VMEM_BUDGET


def scatter_add_rows(idx, contrib, P2: int):
    """Deterministic ``out[n, idx[n, e]] += contrib[n, e]`` dispatcher: the
    banked VMEM Pallas kernel on TPU whenever the accumulator fits
    (`scatter_rows_fits`), else the vmapped XLA scatter (update-serialized
    but correct at any size).  ``idx == -1`` entries contribute nothing.
    Single home for the policy — knn/chamfer/ring backwards all call this."""
    C = contrib.shape[2]
    if jax.default_backend() == "tpu" and scatter_rows_fits(P2, C):
        return scatter_add_rows_pallas(idx, contrib, P2)

    def one(i, v):
        return jnp.zeros((P2, C), contrib.dtype).at[jnp.maximum(i, 0)].add(
            jnp.where((i >= 0)[..., None], v, 0.0)
        )

    return jax.vmap(one)(idx, contrib)


def _scatter_rows_kernel(
    idx_ref,  # SMEM (1, 1, Ec) int32 — target row per entry, -1 skips
    ct_ref,  # SMEM (1, C, Ec) f32 — contributions, channel-major
    *out_refs,  # C x VMEM (1, B, nPages, 8, 128) f32 accumulators
    chunk: int,
    banks: int,
    channels: int,
):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        for c in range(channels):
            out_refs[c][...] = jnp.zeros(out_refs[c].shape, jnp.float32)

    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    def body(step, _):
        for b in range(banks):
            e = step * banks + b
            q = idx_ref[0, 0, e]
            ok = q >= 0
            qs = jnp.where(ok, q, 0)
            page = qs >> 10
            mask = (
                (sub_iota == ((qs >> 7) & 7))
                & (lane_iota == (qs & 127))
                & ok
            )
            for c in range(channels):
                v = ct_ref[0, c, e]
                row = out_refs[c][0, b, pl.ds(page, 1)]
                out_refs[c][0, b, pl.ds(page, 1)] = row + jnp.where(
                    mask, v, 0.0
                )[None]
        return 0

    jax.lax.fori_loop(0, chunk // banks, body, 0, unroll=False)


@functools.partial(
    jax.jit, static_argnames=("P2", "chunk", "banks", "interpret")
)
def scatter_add_rows_pallas(
    idx: Array,
    contrib: Array,
    P2: int = None,
    chunk: int = DEFAULT_CHUNK,
    banks: int = DEFAULT_BANKS,
    interpret: bool = False,
) -> Array:
    """Deterministic ``out[n, idx[n, e]] += contrib[n, e]`` over P2 rows.

    Args:
        idx: (N, E) int32 target rows; negative entries contribute nothing.
        contrib: (N, E, C) f32 contributions, C <= 8.
        P2: number of target rows (static).
        chunk / banks: entries per grid step and independent RMW banks.

    Returns: (N, P2, C) f32 sums, bit-deterministic.
    """
    if not isinstance(P2, int):
        raise ValueError("P2 must be a static int")
    N, E = idx.shape
    C = contrib.shape[2]
    if C > 8:
        raise ValueError(f"scatter_add_rows_pallas supports C <= 8 (got {C})")
    if banks is None:
        per_bank = -(-P2 // 1024) * 1024 * 4 * C
        banks = 1
        while banks < _MAX_BANKS and per_bank * banks * 2 <= _VMEM_BUDGET:
            banks *= 2
    if -(-P2 // 1024) * 1024 * 4 * C * banks > _VMEM_BUDGET:
        raise ValueError(
            f"accumulators for P2={P2}, C={C}, banks={banks} exceed the "
            "VMEM budget; reduce banks or fall back to the XLA scatter"
        )
    chunk = max(banks, min(chunk, -(-E // banks) * banks))
    # The kernel covers banks*(chunk//banks) entries per grid step: a chunk
    # that is not a banks multiple would silently drop the tail entries of
    # every step.  Round up; for multi-step grids the lane dim must also be
    # 128-divisible (Mosaic block rule; every banks value divides 128).
    chunk = -(-chunk // banks) * banks
    if chunk < E:
        chunk = -(-chunk // 128) * 128
    Epad = -(-E // chunk) * chunk
    if Epad != E:
        idx = jnp.pad(idx, ((0, 0), (0, Epad - E)), constant_values=-1)
        contrib = jnp.pad(contrib, ((0, 0), (0, Epad - E), (0, 0)))
    n_pages = -(-P2 // 1024)
    P2pad = n_pages * 1024
    # Mosaic block-shape rule: a block's last two dims must divide (8, 128)
    # or EQUAL the array's.  idx as (N, Epad) with block (1, chunk) breaks
    # for N > 1 (sublane dim 1 != N); a singleton middle axis makes the
    # blocked trailing dims (1, chunk) vs array (1, Epad) — always legal
    # (chunk is either Epad itself or the 128-divisible DEFAULT_CHUNK).
    idx3 = idx[:, None, :]  # (N, 1, Epad)
    ct = jnp.swapaxes(contrib, 1, 2)  # (N, C, Epad)

    kernel = functools.partial(
        _scatter_rows_kernel, chunk=chunk, banks=banks, channels=C
    )
    out_specs = [
        pl.BlockSpec(
            (1, banks, n_pages, 8, 128),
            lambda n, s: (n, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        for _ in range(C)
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((N, banks, n_pages, 8, 128), jnp.float32)
        for _ in range(C)
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(N, Epad // chunk),
        in_specs=[
            pl.BlockSpec(
                (1, 1, chunk), lambda n, s: (n, 0, s),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, C, chunk), lambda n, s: (n, 0, s),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * Epad * C,
            bytes_accessed=4 * N * (Epad * (1 + C) + P2pad * C),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(idx3, ct)
    # Fixed-order bank sum keeps determinism; page-major reshape restores
    # row order (q = page*1024 + sub*128 + lane).
    chans = [o.sum(axis=1).reshape(N, P2pad)[:, :P2] for o in outs]
    return jnp.stack(chans, axis=2)
