"""Multi-leaf prefix scans as Pallas TPU kernels.

XLA lowers ``jax.lax.associative_scan`` to a log-depth cascade of pad/slice/
concat ops that rematerializes the array ~20 times through HBM (~1.1 ms per
1M int32 on v5e). The boundary pass in :mod:`jtokkit_tpu.ops.stage4` needs
up to eight such scans per chunk, making them the dominant stage-A cost.

These kernels compute the same scans in one pass over the data: the stream
is tiled as [rows, 128 lanes] blocks resident in VMEM, each block runs a
two-level log-step scan in registers (7 lane steps + log2(rows) sublane
steps via ``pltpu.roll``), and a scalar carry in SMEM chains consecutive
grid steps (the TPU grid is sequential, so scratch persists). Supported
per-leaf combines:

- ``max``   — running maximum (identity -1; used for masked-position cummax)
- ``last``  — latest value >= 0 wins (select-scan; identity -1)
- ``add``   — running sum (identity 0)

``scan_leaves(..., reverse=True)`` matches
``associative_scan(comb, x, reverse=True)``: the nearest-set-to-the-RIGHT /
suffix variants, implemented with mirrored rolls and a reversed grid.

All leaves are scanned inside ONE kernel launch from a stacked
[L, N/128, 128] int32 array, so the whole boundary pass costs ~2 passes of
HBM traffic instead of ~20 per leaf.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

MAX_BLOCK_ROWS = 256  # 256 x 128 = 32K elems per leaf per grid step


def _ident(kind: str):
    return 0 if kind == "add" else -1


def _combine(kind: str, earlier, later):
    """Combine aggregates; ``earlier`` precedes ``later`` in SCAN order
    (stream order forward, reversed stream order for suffix scans)."""
    if kind == "max":
        return jnp.maximum(earlier, later)
    if kind == "last":
        return jnp.where(later >= 0, later, earlier)
    if kind == "add":
        return earlier + later
    raise ValueError(kind)


def _block_scan_fwd(x, kind: str):
    """Inclusive scan over row-major stream order of one [R, 128] block."""
    from jax.experimental.pallas import tpu as pltpu

    R = x.shape[0]
    ident = _ident(kind)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    k = 1
    while k < 128:
        sh = pltpu.roll(x, k, axis=1)
        sh = jnp.where(lane >= k, sh, ident)
        x = _combine(kind, sh, x)
        k *= 2
    # row-level exclusive prefixes from inclusive row totals (last lane)
    agg = x[:, 127:128]
    row = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    k = 1
    while k < R:
        sh = pltpu.roll(agg, k, axis=0)
        sh = jnp.where(row >= k, sh, ident)
        agg = _combine(kind, sh, agg)
        k *= 2
    prev = pltpu.roll(agg, 1, axis=0)
    prev = jnp.where(row >= 1, prev, ident)
    return _combine(kind, prev, x)


def _block_scan_rev(x, kind: str):
    """Inclusive scan over REVERSED stream order (suffix scan) of a block."""
    from jax.experimental.pallas import tpu as pltpu

    R = x.shape[0]
    ident = _ident(kind)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    k = 1
    while k < 128:
        sh = pltpu.roll(x, 128 - k, axis=1)  # == negative roll by k
        sh = jnp.where(lane < 128 - k, sh, ident)
        x = _combine(kind, sh, x)
        k *= 2
    agg = x[:, 0:1]  # inclusive suffix totals per row live in lane 0
    row = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    k = 1
    while k < R:
        sh = pltpu.roll(agg, R - k, axis=0)
        sh = jnp.where(row < R - k, sh, ident)
        agg = _combine(kind, sh, agg)
        k *= 2
    nxt = pltpu.roll(agg, R - 1, axis=0)
    nxt = jnp.where(row < R - 1, nxt, ident)
    return _combine(kind, nxt, x)


def _kernel(x_ref, out_ref, carry_ref, *, kinds, rows, reverse):
    import jax.experimental.pallas as pl

    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        for j, kind in enumerate(kinds):
            carry_ref[j] = _ident(kind)

    for j, kind in enumerate(kinds):
        x = x_ref[j]
        s = (_block_scan_rev if reverse else _block_scan_fwd)(x, kind)
        c = carry_ref[j]
        if reverse:
            # carry aggregates all LATER blocks, which come FIRST in
            # reversed scan order
            s = _combine(kind, jnp.full_like(s, c), s)
            carry_ref[j] = s[0, 0]
        else:
            s = _combine(kind, jnp.full_like(s, c), s)
            carry_ref[j] = s[rows - 1, 127]
        out_ref[j] = s


def _enabled_default() -> bool:
    env = os.environ.get("JTOKKIT_PALLAS_SCAN")
    if env is not None:
        return env not in ("0", "false", "no")
    return jax.default_backend() == "tpu"


@functools.partial(
    jax.jit, static_argnames=("kinds", "reverse", "interpret")
)
def _scan_stacked(stacked, *, kinds, reverse, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, Nr, _ = stacked.shape
    rows = min(MAX_BLOCK_ROWS, Nr)
    grid = Nr // rows
    index_map = (lambda g: (0, grid - 1 - g, 0)) if reverse else (
        lambda g: (0, g, 0)
    )
    # under shard_map the output varies over the same mesh axes as the
    # input; without this the TPU lowering rejects the call ("vma on
    # jax.ShapeDtypeStruct must not be None" when check_vma=True)
    vma = getattr(jax.typeof(stacked), "vma", frozenset())
    return pl.pallas_call(
        functools.partial(_kernel, kinds=kinds, rows=rows, reverse=reverse),
        grid=(grid,),
        out_shape=jax.ShapeDtypeStruct((L, Nr, 128), jnp.int32, vma=vma),
        in_specs=[pl.BlockSpec((L, rows, 128), index_map,
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((L, rows, 128), index_map,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((L,), jnp.int32)],
        interpret=interpret,
    )(stacked)


def can_use(n: int) -> bool:
    """Whether the kernel handles this stream length (lane-tileable)."""
    if n < 128 * 8 or n % 128:
        return False
    nr = n // 128
    return nr <= MAX_BLOCK_ROWS or nr % MAX_BLOCK_ROWS == 0


def scan_leaves(leaves, kinds, *, reverse: bool = False,
                enabled: bool | None = None, interpret: bool | None = None):
    """Scan each int32[N] leaf with its combine kind; one kernel launch.

    Falls back to ``jax.lax.associative_scan`` when the kernel is disabled
    (non-TPU backends by default; override with JTOKKIT_PALLAS_SCAN=0/1) or
    the length is not lane-tileable.
    """
    leaves = [jnp.asarray(x, jnp.int32) for x in leaves]
    n = leaves[0].shape[0]
    if enabled is None:
        enabled = _enabled_default()
    if not enabled or not can_use(n):
        # associative_scan hands the combine (earlier-in-scan-order,
        # later-in-scan-order) for BOTH directions (reverse=True flips the
        # array first), matching _combine's convention directly
        def comb(a, b):
            return tuple(
                _combine(kind, x, y) for kind, x, y in zip(kinds, a, b)
            )
        return list(jax.lax.associative_scan(
            comb, tuple(leaves), reverse=reverse
        ))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    stacked = jnp.stack([x.reshape(-1, 128) for x in leaves])
    out = _scan_stacked(
        stacked, kinds=tuple(kinds), reverse=reverse, interpret=interpret
    )
    return [out[j].reshape(n) for j in range(len(leaves))]
