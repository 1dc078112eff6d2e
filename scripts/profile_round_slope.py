"""In-jit repetition slopes of the actual merge-round building blocks."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jtokkit_tpu.engine.device import enable_compile_cache
from jtokkit_tpu.ops import colscan, merge_exact
from jtokkit_tpu.vocab import tables as vtables
from jtokkit_tpu.vocab.definitions import BUILTIN_DEFINITIONS
from jtokkit_tpu.vocab.loader import asset_path, load_builtin_ranks

enable_compile_cache()
d = BUILTIN_DEFINITIONS["cl100k_base"]
ranks = load_builtin_ranks(d.vocab_name)
packed = vtables.load_packed("cl100k_base", ranks, asset_path("cl100k_base"))
rows0 = jnp.asarray(np.stack([packed.cuckoo_u[0], packed.cuckoo_v[0], packed.cuckoo_id[0], packed.cuckoo_safe[0]], axis=1))
rows1 = jnp.asarray(np.stack([packed.cuckoo_u[1], packed.cuckoo_v[1], packed.cuckoo_id[1], packed.cuckoo_safe[1]], axis=1))
mask = packed.table_mask

def slope(make_fn, reps=(2, 14)):
    f1, f2 = jax.jit(make_fn(reps[0])), jax.jit(make_fn(reps[1]))
    def t(f):
        np.asarray(f().ravel()[0])
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter(); np.asarray(f().ravel()[0])
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(f2) - t(f1)) / (reps[1] - reps[0])

rng = np.random.RandomState(0)
W, R = 384, 4096
S = W * R
u0 = jnp.asarray(rng.randint(0, 100000, size=(W, R)).astype(np.int32))
v0 = jnp.asarray(rng.randint(0, 100000, size=(W, R)).astype(np.int32))

which = os.environ.get("PRIMS", "lookup").split(",")

if "lookup" in which:
    def mk(n):
        def f():
            u, v = u0, v0
            for _ in range(n):
                rid, safe = merge_exact.pair_lookup_safe(u, v, rows0, rows1, mask)
                u = jnp.abs(rid) % 100000
                v = (v + safe) % 100000
            return u
        return f
    s = slope(mk)
    print(f"pair_lookup_safe [{W}x{R}]: {s*1e3:.2f} ms/rep ({s*1e3/(S/1e6):.2f} ms/1M)", flush=True)

if "round" in which:
    lenc0 = jnp.ones((W, R), jnp.int32)
    off0 = jnp.asarray(np.broadcast_to(np.arange(W, dtype=np.int32)[:, None], (W, R)).copy())
    act0 = jnp.asarray(rng.rand(W, R) < 0.7)
    def mk(n):
        def f():
            ids, lenc, act = u0, lenc0, act0
            for _ in range(n):
                ids, lenc, act, alive, counts = merge_exact._general_round(ids, lenc, off0, act, rows0, rows1, mask)
                ids = jnp.abs(ids) % 100000
            return counts
        return f
    s = slope(mk, (1, 8))
    print(f"_general_round [{W}x{R}]: {s*1e3:.2f} ms/rep ({s*1e3/(S/1e6):.2f} ms/1M)", flush=True)

if "scan" in which:
    def mk(n):
        def f():
            a = u0
            for _ in range(n):
                a = colscan.col_scan([a], ["last"])[0] - 1
            return a
        return f
    s = slope(mk)
    print(f"colscan [{W}x{R}]: {s*1e3:.2f} ms/rep", flush=True)
    def mk6(n):
        def f():
            a, b = u0, v0
            for _ in range(n):
                a, = colscan.excl_fwd([a], ["last"]); b, = colscan.excl_rev([b], ["last"])
                a2, b2 = colscan.excl_fwd([a, b], ["last", "last"])
                a3, = colscan.excl_rev([a2], ["last"]); b3, b4 = colscan.excl_rev([b2, a2], ["last", "last"])
                c, = colscan.excl_fwd([b3], ["last"])
                a = (a3 + c) % (1 << 20); b = (b4 + 1) % (1 << 20)
            return a
        return f
    s = slope(mk6, (1, 6))
    print(f"7-launch scan group [{W}x{R}]: {s*1e3:.2f} ms/rep", flush=True)

if "sort" in which:
    def mk(n):
        def f():
            a, b, c = u0, v0, u0 ^ 3
            for _ in range(n):
                a, b, c = jax.lax.sort((a, b, c), dimension=0, num_keys=1)
                a = (a + 1) % (1 << 20)
            return a
        return f
    s = slope(mk, (1, 8))
    print(f"sort3 axis0 [{W}x{R}]: {s*1e3:.2f} ms/rep", flush=True)
