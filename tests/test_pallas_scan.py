"""Pallas block-carry scan kernel vs jax.lax.associative_scan.

The kernel only compiles on TPU; here it runs in interpreter mode so its
block/roll/carry logic is exercised on the CPU backend. The end-to-end
boundary semantics are covered by the device-engine conformance tests
(which use the associative_scan fallback on CPU) plus the on-TPU bench
verification (bench.py verify=True).
"""

import numpy as np
import pytest

from jtokkit_tpu.ops import pallas_scan


def _reference(leaves, kinds, reverse):
    import jax

    def comb(a, b):
        return tuple(
            pallas_scan._combine(k, x, y) for k, x, y in zip(kinds, a, b)
        )

    return [
        np.asarray(x)
        for x in jax.lax.associative_scan(
            comb, tuple(leaves), reverse=reverse
        )
    ]


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("n", [1024, 32768, 131072])
def test_scan_matches_associative_scan(n, reverse):
    import jax.numpy as jnp

    rng = np.random.default_rng(n + reverse)
    # masked-position patterns like the boundary leaves: mostly -1, sparse
    # set positions, plus a dense add leaf
    m1 = rng.random(n) < 0.1
    m2 = rng.random(n) < 0.01
    idx = np.arange(n, dtype=np.int32)
    leaves = [
        np.where(m1, idx * 2 + (idx % 2), -1).astype(np.int32),
        np.where(m2, rng.integers(0, 7, n), -1).astype(np.int32),
        rng.integers(0, 2, n).astype(np.int32),
    ]
    kinds = ["max", "last", "add"]
    want = _reference([jnp.asarray(x) for x in leaves], kinds, reverse)
    got = pallas_scan.scan_leaves(
        [jnp.asarray(x) for x in leaves], kinds,
        reverse=reverse, enabled=True, interpret=True,
    )
    for k, g, w in zip(kinds, got, want):
        np.testing.assert_array_equal(np.asarray(g), w, err_msg=k)


def test_fallback_on_untileable_length():
    import jax.numpy as jnp

    n = 1000  # not a multiple of 128
    assert not pallas_scan.can_use(n)
    x = jnp.asarray(np.random.default_rng(0).integers(-1, 50, n), jnp.int32)
    got = pallas_scan.scan_leaves([x], ["max"], enabled=True)
    want = _reference([x], ["max"], False)
    np.testing.assert_array_equal(np.asarray(got[0]), want[0])


@pytest.mark.parametrize("n,size,density", [
    (131072, 32768, 0.2),
    (131072, 4096, 0.01),
    (1024, 512, 0.9),
    (1000, 300, 0.5),   # untileable length -> nonzero fallback
    (8192, 8192, 0.0),  # empty mask
])
def test_masked_positions_matches_nonzero(n, size, density):
    import jax.numpy as jnp

    from jtokkit_tpu.ops import stage4

    rng = np.random.default_rng(n + size)
    m = jnp.asarray(rng.random(n) < density)
    got = np.asarray(stage4.masked_positions(m, size, n))
    want = np.asarray(jnp.nonzero(m, size=size, fill_value=n)[0])
    np.testing.assert_array_equal(got, want)
