"""Per-column prefix scans over [W, R] matrices (independent columns).

The exact batched merge (:mod:`jtokkit_tpu.ops.merge_exact`) propagates
neighbor metadata along each piece's sublane column several times per round.
``jax.lax.associative_scan(axis=0)`` lowers to a log-depth pad/slice cascade
that rematerializes the matrix through HBM each step; columns are
independent, so the Pallas kernel here runs the whole log-step scan on a
VMEM-resident [W, 128-lane] block with ``pltpu.roll`` along sublanes — one
HBM read + one write per leaf, embarrassingly parallel over the lane grid
(no cross-block carry, unlike :mod:`.pallas_scan`'s stream scans).

Combine kinds (identical semantics to :mod:`.pallas_scan`):

- ``last`` — latest value >= 0 in scan order wins (identity -1)
- ``max``  — running maximum (identity -1)
- ``add``  — running sum (identity 0)

``reverse=True`` scans bottom-up (suffix scan within the column).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

# Per-block VMEM budget: in + out + headroom. Blocks are [L, W, 128] int32.
_MAX_BLOCK_BYTES = 4 * 1024 * 1024


def _ident(kind: str):
    return 0 if kind == "add" else -1


def _combine(kind: str, earlier, later):
    if kind == "max":
        return jnp.maximum(earlier, later)
    if kind == "last":
        return jnp.where(later >= 0, later, earlier)
    if kind == "add":
        return earlier + later
    raise ValueError(kind)


def _block_col_scan(x, kind: str, reverse: bool):
    """Inclusive scan along axis 0 of one [W, 128] block."""
    from jax.experimental.pallas import tpu as pltpu

    W = x.shape[0]
    ident = _ident(kind)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    k = 1
    while k < W:
        if reverse:
            sh = pltpu.roll(x, W - k, axis=0)
            sh = jnp.where(row < W - k, sh, ident)
        else:
            sh = pltpu.roll(x, k, axis=0)
            sh = jnp.where(row >= k, sh, ident)
        x = _combine(kind, sh, x)
        k *= 2
    return x


def _kernel(x_ref, out_ref, *, kinds, reverse):
    for j, kind in enumerate(kinds):
        out_ref[j] = _block_col_scan(x_ref[j], kind, reverse)


@functools.partial(jax.jit, static_argnames=("kinds", "reverse", "interpret"))
def _scan_stacked(stacked, *, kinds, reverse, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, W, R = stacked.shape
    grid = R // 128
    return pl.pallas_call(
        functools.partial(_kernel, kinds=kinds, reverse=reverse),
        grid=(grid,),
        out_shape=jax.ShapeDtypeStruct((L, W, R), jnp.int32),
        in_specs=[pl.BlockSpec((L, W, 128), lambda g: (0, 0, g),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((L, W, 128), lambda g: (0, 0, g),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(stacked)


def _enabled_default() -> bool:
    # DISABLED by default: measured on v5e (scripts/profile_lookup_ctx.py),
    # a gather whose index operand is produced by this kernel pays a ~34 ms
    # relayout penalty at [384, 4096], while the XLA associative_scan
    # cascade along axis 0 is ~free (log2(W) <= 12 vectorized steps). The
    # kernel remains available for layout experiments.
    env = os.environ.get("JTOKKIT_PALLAS_COLSCAN")
    if env is not None:
        return env not in ("0", "false", "no")
    return False


def can_use(n_leaves: int, w: int, r: int) -> bool:
    if r < 128 or r % 128 or w % 8 or w < 8:
        return False
    return n_leaves * w * 128 * 4 * 2 <= _MAX_BLOCK_BYTES


def col_scan(leaves, kinds, *, reverse: bool = False,
             enabled: bool | None = None, interpret: bool | None = None):
    """Inclusive per-column scan of each int32[W, R] leaf; one launch."""
    leaves = [jnp.asarray(x, jnp.int32) for x in leaves]
    w, r = leaves[0].shape
    if enabled is None:
        enabled = _enabled_default()
    if not enabled or not can_use(len(leaves), w, r):
        def comb(a, b):
            return tuple(
                _combine(kind, x, y) for kind, x, y in zip(kinds, a, b)
            )
        return list(jax.lax.associative_scan(
            comb, tuple(leaves), reverse=reverse, axis=0
        ))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = _scan_stacked(
        jnp.stack(leaves), kinds=tuple(kinds), reverse=reverse,
        interpret=interpret,
    )
    return [out[j] for j in range(len(leaves))]


def excl_fwd(leaves, kinds, **kw):
    """Exclusive forward scan: value aggregated over rows strictly above."""
    incl = col_scan(leaves, kinds, reverse=False, **kw)
    out = []
    for x, kind in zip(incl, kinds):
        fill = jnp.full((1, x.shape[1]), _ident(kind), jnp.int32)
        out.append(jnp.concatenate([fill, x[:-1]], axis=0))
    return out


def excl_rev(leaves, kinds, **kw):
    """Exclusive reverse scan: value aggregated over rows strictly below."""
    incl = col_scan(leaves, kinds, reverse=True, **kw)
    out = []
    for x, kind in zip(incl, kinds):
        fill = jnp.full((1, x.shape[1]), _ident(kind), jnp.int32)
        out.append(jnp.concatenate([x[1:], fill], axis=0))
    return out
