import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jtokkit_tpu.engine.device import enable_compile_cache
from jtokkit_tpu.ops import colscan, merge_exact as me
from jtokkit_tpu.vocab import tables as vtables
from jtokkit_tpu.vocab.definitions import BUILTIN_DEFINITIONS
from jtokkit_tpu.vocab.loader import asset_path, load_builtin_ranks
enable_compile_cache()
ranks = load_builtin_ranks("cl100k_base")
packed = vtables.load_packed("cl100k_base", ranks, asset_path("cl100k_base"))
rows0 = jnp.asarray(np.stack([packed.cuckoo_u[0], packed.cuckoo_v[0], packed.cuckoo_id[0], packed.cuckoo_safe[0]], axis=1))
rows1 = jnp.asarray(np.stack([packed.cuckoo_u[1], packed.cuckoo_v[1], packed.cuckoo_id[1], packed.cuckoo_safe[1]], axis=1))
mask = packed.table_mask
rng = np.random.RandomState(0)
W, R = 384, 4096
u0 = jnp.asarray(rng.randint(0, 100000, size=(W, R)).astype(np.int32))
act0 = jnp.asarray(rng.rand(W, R) < 0.7)

def variant(kind):
    def one(ids, active):
        pack = jnp.where(active, ids * 32 + 1, -1)
        if kind == "scan_v":
            (nxt_pack,) = colscan.excl_rev([pack], ["last"])
            v = jnp.where(nxt_pack >= 0, nxt_pack >> 5, -1)
        elif kind == "scan_v_assoc":
            (nxt_pack,) = colscan.excl_rev([pack], ["last"], enabled=False)
            v = jnp.where(nxt_pack >= 0, nxt_pack >> 5, -1)
        elif kind == "shift_v":
            nxt_pack = jnp.concatenate([pack[1:], jnp.full((1, R), -1, jnp.int32)], axis=0)
            v = jnp.where(nxt_pack >= 0, nxt_pack >> 5, -1)
        elif kind == "raw_v":
            v = ids ^ 1
        rid, safe = me.pair_lookup_safe(ids, v, rows0, rows1, mask)
        return jnp.abs(rid ^ safe ^ ids) % 100000
    return one

def slope(kind, reps=(1, 6)):
    fn = variant(kind)
    def mk(n):
        def f():
            ids = u0
            for _ in range(n):
                ids = fn(ids, act0)
            return ids
        return f
    f1, f2 = jax.jit(mk(reps[0])), jax.jit(mk(reps[1]))
    def t(f):
        np.asarray(f().ravel()[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(f().ravel()[0])
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(f2) - t(f1)) / (reps[1] - reps[0])

for kind in os.environ.get("KINDS", "raw_v,shift_v,scan_v,scan_v_assoc").split(","):
    print(f"{kind}: {slope(kind)*1e3:.2f} ms/rep", flush=True)
