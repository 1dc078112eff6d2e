import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jtokkit_tpu.engine.device import enable_compile_cache
from jtokkit_tpu.ops import colscan, merge_exact as me
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
MAX_RANK = me.MAX_RANK

def stage_fn(stage):
    def one(ids, lenc, off, active):
        pack = jnp.where(active, ids * 32 + lenc, -1)
        (prv_pack,) = colscan.excl_fwd([pack], ["last"])
        (nxt_pack,) = colscan.excl_rev([pack], ["last"])
        nxt_id = jnp.where(nxt_pack >= 0, nxt_pack >> 5, -1)
        nxt_len = nxt_pack & 31
        has_pair = active & (nxt_pack >= 0)
        if stage == 0:
            return ids ^ prv_pack ^ nxt_pack, lenc, active
        r_raw, safe = me.pair_lookup_safe(ids, nxt_id, rows0, rows1, mask)
        rank = jnp.where(has_pair & (r_raw >= 0), r_raw, MAX_RANK)
        if stage == 1:
            return ids ^ rank ^ safe ^ prv_pack, lenc, active
        rank_leaf = jnp.where(active, rank, -1)
        prv2_leaf = jnp.where(active, prv_pack, -1)
        rank_prv, prv2_pack = colscan.excl_fwd([rank_leaf, prv2_leaf], ["last", "last"])
        nxt2_leaf = jnp.where(active, nxt_pack, -1)
        rank_nxt, nxt2_pack = colscan.excl_rev([rank_leaf, nxt2_leaf], ["last", "last"])
        (rank_prv2,) = colscan.excl_fwd([jnp.where(active, rank_prv, -1)], ["last"])
        rank_nxt2, nxt3_pack = colscan.excl_rev([jnp.where(active, rank_nxt, -1), jnp.where(active, nxt2_pack, -1)], ["last", "last"])
        if stage == 2:
            return ids ^ rank_prv ^ rank_nxt ^ rank_prv2 ^ rank_nxt2 ^ nxt3_pack, lenc, active
        za_raw, _ = me.pair_lookup_safe(rank_prv2, ids, rows0, rows1, mask)
        za_rank = jnp.where(za_raw >= 0, za_raw, MAX_RANK)
        de_raw, _ = me.pair_lookup_safe(nxt_id, rank_nxt2, rows0, rows1, mask)
        de_rank = jnp.where(de_raw >= 0, de_raw, MAX_RANK)
        if stage == 3:
            return ids ^ za_rank ^ de_rank, lenc, active
        no_a = prv_pack < 0; no_z = prv2_pack < 0
        len_a = prv_pack & 31; len_z = prv2_pack & 31
        l1 = no_a | (rank_prv > rank)
        za_ok = (rank_prv2 < 0) | (rank_prv2 > rank) | (za_rank > rank)
        l2 = no_a | no_z | (me._safe_bit(safe, 0, len_z + len_a) & za_ok)
        no_d = nxt2_pack < 0; no_e = nxt3_pack < 0
        len_d = nxt2_pack & 31; len_e = nxt3_pack & 31
        r1 = no_d | (rank_nxt >= rank)
        de_ok = (rank_nxt2 < 0) | (rank_nxt2 >= rank) | (de_rank >= rank)
        r2 = no_d | no_e | (me._safe_bit(safe, 1, len_d + len_e) & de_ok)
        valid = rank < MAX_RANK
        do = valid & l1 & l2 & r1 & r2
        if stage == 4:
            return ids ^ do, lenc, active
        col_any = jnp.any(do, axis=0)
        minval = jnp.min(rank, axis=0)
        m = jnp.argmin(rank, axis=0).astype(jnp.int32)
        force = (~col_any) & (minval < MAX_RANK)
        subl = jax.lax.broadcasted_iota(jnp.int32, ids.shape, 0)
        do = do | (force[None, :] & (subl == m[None, :]))
        if stage == 5:
            return ids ^ do, lenc, active
        (do_prv,) = colscan.excl_fwd([jnp.where(active, do.astype(jnp.int32), -1)], ["last"])
        consumed = active & (do_prv == 1)
        new_ids = jnp.where(do, rank, ids)
        new_lenc = jnp.where(do, jnp.minimum(lenc + nxt_len, 16), lenc)
        new_active = active & ~consumed
        return new_ids, new_lenc, new_active
    return one

def slope(stage, reps=(1, 6)):
    rng = np.random.RandomState(0)
    W, R = 384, 4096
    u0 = jnp.asarray(rng.randint(0, 100000, size=(W, R)).astype(np.int32))
    lenc0 = jnp.ones((W, R), jnp.int32)
    off0 = jnp.asarray(np.broadcast_to(np.arange(W, dtype=np.int32)[:, None], (W, R)).copy())
    act0 = jnp.asarray(rng.rand(W, R) < 0.7)
    fn = stage_fn(stage)
    def mk(n):
        def f():
            ids, lenc, act = u0, lenc0, act0
            for _ in range(n):
                ids, lenc, act = fn(ids, lenc, off0, act)
                ids = jnp.abs(ids) % 100000
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

for stage in [int(x) for x in os.environ.get("STAGES", "0,1,2,3,4,5,6").split(",")]:
    print(f"stage {stage}: {slope(stage)*1e3:.2f} ms/rep", flush=True)
