"""Per-column prefix scans over [W, R] matrices (independent columns).

Thin wrappers over ``jax.lax.associative_scan(axis=0)`` used by the
wide-bucket hybrid merge's batched byte round
(:mod:`jtokkit_tpu.ops.merge_exact`). A Pallas block kernel for these
scans was built and measured in round 3: a gather whose index operand was
produced by the kernel paid a ~34 ms relayout penalty at [384, 4096]
while the XLA cascade along axis 0 is ~free (log2(W) <= 12 vectorized
steps), so the kernel was removed and the XLA lowering is THE
implementation.

Combine kinds (identical semantics to :mod:`.pallas_scan`):

- ``last`` — latest value >= 0 in scan order wins (identity -1)
- ``max``  — running maximum (identity -1)
- ``add``  — running sum (identity 0)

``reverse=True`` scans bottom-up (suffix scan within the column).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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


def col_scan(leaves, kinds, *, reverse: bool = False):
    """Inclusive per-column scan of each int32[W, R] leaf."""
    leaves = [jnp.asarray(x, jnp.int32) for x in leaves]

    def comb(a, b):
        return tuple(
            _combine(kind, x, y) for kind, x, y in zip(kinds, a, b)
        )

    return list(jax.lax.associative_scan(
        comb, tuple(leaves), reverse=reverse, axis=0
    ))


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
