"""Micro-profile of one beam-search iteration's stages at bench shapes.

Each stage runs REPS times inside one jitted lax.scan program (so the
~30-45 ms per-dispatch relay cost amortizes away) and is timed by a
scalar fetch. Shapes mirror the tuned bench config: B=2048 queries,
L(beam)=16, M(expand)=4, R(degree)=48, C=M*R=192, compact=96, table
500k x 128 bf16. Answers: is the iteration gather-bound, score-bound,
or sort/merge-bound — the design input for a fused Pallas traversal
kernel (VERDICT r3 #2b).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, L, M, R, CP, DIM = 2048, 16, 4, 48, 96, 128
REPS = 20
N = int(os.environ.get("IM_N", 500_000))


def timed(fn, label, *args):
    fn(*args)  # compile+warm
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(*args)
        walls.append(time.perf_counter() - t0)
    w = float(np.median(walls))
    per_rep_ms = (w / REPS) * 1e3
    print(json.dumps({"stage": label, "per_rep_ms": round(per_rep_ms, 3),
                      "wall_ms": round(w * 1e3, 1)}), flush=True)


def main():
    import functools

    import jax
    import jax.numpy as jnp

    import vectordb_tpu  # noqa: F401

    rng = np.random.default_rng(0)
    npad = -(-N // 8192) * 8192
    tab = jnp.asarray(rng.normal(size=(npad, DIM)).astype(np.float32),
                      dtype=jnp.bfloat16)
    tab8 = jnp.asarray(rng.integers(-127, 127, size=(npad, R * DIM),
                                    dtype=np.int8))
    q = jnp.asarray(rng.normal(size=(B, DIM)).astype(np.float32),
                    dtype=jnp.bfloat16)
    qn = jnp.sum(q.astype(jnp.float32) ** 2, axis=1)
    adj = jnp.asarray(rng.integers(0, N, size=(npad, R), dtype=np.int32))
    ids_cp = jnp.asarray(rng.integers(0, N, size=(B, CP), dtype=np.int32))
    ids_c = jnp.asarray(rng.integers(0, N, size=(B, M * R), dtype=np.int32))
    picked = jnp.asarray(rng.integers(0, N, size=(B, M), dtype=np.int32))
    beam_d = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
    beam_i = jnp.asarray(rng.integers(0, N, size=(B, L), dtype=np.int32))
    cand_d = jnp.asarray(
        rng.normal(size=(B, CP)).astype(np.float32))
    cand_d_wide = jnp.asarray(
        rng.normal(size=(B, M * R)).astype(np.float32))

    def scanify(body):
        @jax.jit
        def run(*args):
            def step(c, _):
                return c + body(*args, c), None
            out, _ = jax.lax.scan(step, jnp.float32(0), None, length=REPS)
            return out
        def wrapped(*args):
            return float(run(*args))
        return wrapped

    # 1. split-path gather+score: gather [B*CP] 256B rows, einsum scores
    def gather_score(tab, ids, q, qn, c):
        vecs = jnp.take(tab, (ids + c.astype(jnp.int32) % 2).reshape(-1),
                        axis=0).reshape(B, CP, DIM)
        ip = jnp.einsum("bcd,bd->bc", vecs, q,
                        preferred_element_type=jnp.float32)
        vn = jnp.einsum("bcd,bcd->bc", vecs, vecs,
                        preferred_element_type=jnp.float32)
        return (qn[:, None] - 2 * ip + vn).sum() * 1e-9
    timed(scanify(gather_score), "split_gather+score_cp96",
          tab, ids_cp, q, qn)

    # 1b. gather only (sum the rows, no einsum)
    def gather_only(tab, ids, c):
        vecs = jnp.take(tab, (ids + c.astype(jnp.int32) % 2).reshape(-1),
                        axis=0)
        return vecs.astype(jnp.float32).sum() * 1e-9
    timed(scanify(gather_only), "gather_only_cp96", tab, ids_cp)

    # 1c. score only (vecs fixed, no gather) — einsum formulation
    vecs_fixed = jnp.take(tab, ids_cp.reshape(-1), axis=0).reshape(
        B, CP, DIM)

    def score_only(vecs, q, qn, c):
        vecs = vecs + c.astype(jnp.bfloat16) * 0
        ip = jnp.einsum("bcd,bd->bc", vecs, q,
                        preferred_element_type=jnp.float32)
        vn = jnp.einsum("bcd,bcd->bc", vecs, vecs,
                        preferred_element_type=jnp.float32)
        return (qn[:, None] - 2 * ip + vn).sum() * 1e-9
    timed(scanify(score_only), "score_only_einsum_cp96", vecs_fixed, q, qn)

    # 1d. score via VPU multiply-reduce
    def score_vpu(vecs, q, qn, c):
        vecs = vecs + c.astype(jnp.bfloat16) * 0
        vf = vecs.astype(jnp.float32)
        qf = q.astype(jnp.float32)[:, None, :]
        ip = (vf * qf).sum(-1)
        vn = (vf * vf).sum(-1)
        return (qn[:, None] - 2 * ip + vn).sum() * 1e-9
    timed(scanify(score_vpu), "score_only_vpu_cp96", vecs_fixed, q, qn)

    # 2. dedup masks: candidate-vs-beam, candidate-vs-candidate, visited
    visited = jnp.asarray(rng.integers(0, N, size=(B, 16), dtype=np.int32))

    def dedup(cand, beam_i, visited, c):
        cand = cand + c.astype(jnp.int32) % 2
        in_beam = jnp.any(cand[:, :, None] == beam_i[:, None, :], axis=2)
        first = jnp.argmax(cand[:, :, None] == cand[:, None, :], axis=2)
        dup = first != jax.lax.broadcasted_iota(jnp.int32, cand.shape, 1)
        seen = jnp.any(cand[:, :, None] == visited[:, None, :], axis=2)
        return ((cand < 0) | in_beam | dup | seen).sum().astype(
            jnp.float32) * 1e-9
    timed(scanify(dedup), "dedup_masks_C192", ids_c, beam_i, visited)

    # 3. compaction sort [B, C] 2-key stable
    def compaction(cand, c):
        cand = cand + c.astype(jnp.int32) % 2
        key = (cand < 0).astype(jnp.int32)
        _, out = jax.lax.sort((key, cand), dimension=1, num_keys=1,
                              is_stable=True)
        return out[:, :CP].sum().astype(jnp.float32) * 1e-9
    timed(scanify(compaction), "compaction_sort_C192", ids_c)

    # 4. merge sort [B, L+CP] 3-tuple
    def merge(beam_d, beam_i, cand_d, cand_i, c):
        all_d = jnp.concatenate([beam_d + c * 0, cand_d], axis=1)
        all_i = jnp.concatenate([beam_i, cand_i], axis=1)
        all_e = jnp.concatenate(
            [jnp.ones((B, L), jnp.bool_), jnp.zeros(cand_d.shape,
                                                    jnp.bool_)], axis=1)
        sd, si, se = jax.lax.sort((all_d, all_i, all_e), dimension=1,
                                  num_keys=1)
        return sd[:, :L].sum() * 1e-9
    timed(scanify(merge), "merge_sort_L16+cp96", beam_d, beam_i, cand_d,
          ids_cp)
    timed(scanify(merge), "merge_sort_L16+C192", beam_d, beam_i,
          cand_d_wide, ids_c)

    # 5. adjacency gather [B*M] rows of R int32
    def adj_gather(adj, picked, c):
        cand = jnp.take(adj, (picked + c.astype(jnp.int32) % 2).reshape(-1),
                        axis=0)
        return cand.sum().astype(jnp.float32) * 1e-9
    timed(scanify(adj_gather), "adj_gather_BM", adj, picked)

    # 6. fused int8 gather [B*M] rows of R*DIM int8 + int8-grid score C=192
    def fused_gather_score(tab8, picked, q, qn, c):
        rows = jnp.take(tab8,
                        (picked + c.astype(jnp.int32) % 2).reshape(-1),
                        axis=0)
        vecs = rows.reshape(B, M * R, DIM).astype(jnp.bfloat16)
        ip = jnp.einsum("bcd,bd->bc", vecs, q,
                        preferred_element_type=jnp.float32)
        vn = jnp.einsum("bcd,bcd->bc", vecs, vecs,
                        preferred_element_type=jnp.float32)
        return (qn[:, None] - 2 * ip + vn).sum() * 1e-9
    timed(scanify(fused_gather_score), "fused_gather+score_C192",
          tab8, picked, q, qn)

    # 7. fused + NARROW merge: top-32 of C=192 scores, then merge L+32
    def fused_narrow(tab8, picked, q, qn, beam_d, beam_i, c):
        rows = jnp.take(tab8,
                        (picked + c.astype(jnp.int32) % 2).reshape(-1),
                        axis=0)
        vecs = rows.reshape(B, M * R, DIM).astype(jnp.bfloat16)
        ip = jnp.einsum("bcd,bd->bc", vecs, q,
                        preferred_element_type=jnp.float32)
        vn = jnp.einsum("bcd,bcd->bc", vecs, vecs,
                        preferred_element_type=jnp.float32)
        d = qn[:, None] - 2 * ip + vn
        neg, sel = jax.lax.top_k(-d, 32)
        all_d = jnp.concatenate([beam_d, -neg], axis=1)
        sd = jax.lax.sort(all_d, dimension=1)
        return sd[:, :L].sum() * 1e-9
    timed(scanify(fused_narrow), "fused+topk32+merge48",
          tab8, picked, q, qn, beam_d, beam_i)

    # 8. pick top-M unexpanded (top_k over L)
    def pick(beam_d, c):
        sc = beam_d + c * 0
        _, idx = jax.lax.top_k(-sc, M)
        return idx.sum().astype(jnp.float32) * 1e-9
    timed(scanify(pick), "pick_topM_L16", beam_d)


if __name__ == "__main__":
    main()
