"""Attribute HNSW search time at 10M: ablation profile of the beam core.

Runs on the REAL TPU against an already-built collection (default the
bench_10m_hnsw.py workdir). Each variant is a copy of ops.hnsw._beam_core's
level-0 loop with one component removed (functionally wrong where noted —
timing only), so the per-step cost budget of the production kernel is
measured, not guessed. Also sweeps max_steps (straggler distribution +
recall saturation) and frontier width.

Through the tunnel every variant pays a remote compile (~20-60s); budget
~10 min for the full profile.

Usage: H2H10M_DIR=/tmp/h2h10m_v2 python benchmarks/profile_hnsw_search.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

if os.environ.get("PROF_CPU") == "1":  # small-N smoke runs off-TPU
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from zvec_tpu.ops.hnsw import _batched_sims, _visit_index
from zvec_tpu.ops.runtime import NEG_INF
from zvec_tpu.typing.enum import MetricType

WORK = os.environ.get("H2H10M_DIR", "/tmp/h2h10m_v2")
COL_DIR = os.path.join(WORK, "col")
EF = int(os.environ.get("PROF_EF", 128))
TOPK = 10
Q = int(os.environ.get("PROF_Q", 1024))


def log(msg):
    print(f"[prof {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def beam_variant(
    q, codes, norms, l0_nbrs, entry_ids, scan_budget, *,
    metric, ef, topk, max_steps, frontier, visited_bits,
    skip_dedup=False, skip_visited=False, skip_result=False,
    skip_gather=False, skip_score=False, visited_u8=False,
):
    """ops.hnsw._beam_core's L0 loop with ablation switches (descent elided:
    entry ids are precomputed once on host — the descent is a fixed small
    cost shared by all variants)."""
    nq, d = q.shape
    q = q.astype(jnp.float32)
    n_pad = codes.shape[0]
    m0 = l0_nbrs.shape[1]
    nbits = n_pad if visited_bits <= 0 else (1 << visited_bits)
    words = (nbits + 31) // 32

    entry_sim = _batched_sims(
        q, codes[entry_ids][:, None, :], metric, norms[entry_ids][:, None], None
    )[:, 0]

    kw = max(ef, topk)
    res_s = jnp.full((nq, kw), NEG_INF, jnp.float32).at[:, 0].set(entry_sim)
    res_i = jnp.full((nq, kw), -1, jnp.int32).at[:, 0].set(entry_ids)
    cand_s = jnp.full((nq, ef), NEG_INF, jnp.float32).at[:, 0].set(entry_sim)
    cand_i = jnp.full((nq, ef), -1, jnp.int32).at[:, 0].set(entry_ids)
    cand_x = jnp.zeros((nq, ef), bool)

    if visited_u8:
        visited = jnp.zeros((nq, nbits), jnp.uint8)
    else:
        visited = jnp.zeros((nq, words), jnp.uint32)
    qidx = jnp.arange(nq)
    scanned = jnp.ones((nq,), jnp.int32)
    done = jnp.zeros((nq,), bool)

    def cond(state):
        step = state[-1]
        done = state[-2]
        return jnp.logical_and(step < max_steps, ~jnp.all(done))

    def body(state):
        res_s, res_i, cand_s, cand_i, cand_x, visited, scanned, done, step = state
        avail = (~cand_x) & (cand_i >= 0)
        masked = jnp.where(avail, cand_s, NEG_INF)
        f_sims, f_pos = jax.lax.top_k(masked, frontier)
        f_ids = jnp.take_along_axis(cand_i, f_pos, 1)
        f_ok = f_sims > NEG_INF / 2
        best_sim = f_sims[:, 0]
        has_avail = jnp.any(avail, axis=1)
        res_min = res_s[:, -1]
        res_full = res_i[:, -1] >= 0
        newly_done = (
            (~has_avail) | (res_full & (best_sim < res_min)) | (scanned >= scan_budget)
        )
        done = done | newly_done
        active = ~done

        pos_eq = (
            jnp.arange(cand_x.shape[1])[None, :, None] == f_pos[:, None, :]
        ) & f_ok[:, None, :]
        cand_x = jnp.where(pos_eq.any(-1) & active[:, None], True, cand_x)

        nbrs3 = l0_nbrs[jnp.clip(f_ids, 0)]
        valid3 = (nbrs3 >= 0) & f_ok[:, :, None]
        nbrs = nbrs3.reshape(nbrs3.shape[0], -1)
        valid = valid3.reshape(nbrs.shape) & active[:, None]
        nbrs_safe = jnp.clip(nbrs, 0)

        vix = _visit_index(nbrs_safe, visited_bits)
        if not skip_dedup:
            order = jnp.argsort(jnp.where(valid, vix, 2**30), axis=1)
            sorted_ids = jnp.take_along_axis(vix, order, 1)
            dup_sorted = jnp.concatenate(
                [jnp.zeros((nbrs.shape[0], 1), bool),
                 sorted_ids[:, 1:] == sorted_ids[:, :-1]], axis=1,
            )
            inv = jnp.argsort(order, axis=1)
            dup = jnp.take_along_axis(dup_sorted, inv, 1)
            valid = valid & ~dup

        if skip_visited:
            fresh = valid
        elif visited_u8:
            seen = jnp.take_along_axis(visited, vix, axis=1)
            fresh = valid & (seen == 0)
            visited = visited.at[qidx[:, None], vix].max(
                jnp.where(fresh, jnp.uint8(1), jnp.uint8(0)),
                mode="drop", unique_indices=True,
            )
        else:
            word_idx = vix // 32
            bit = jnp.uint32(1) << (vix % 32).astype(jnp.uint32)
            word_val = jnp.take_along_axis(visited, word_idx, axis=1)
            fresh = valid & ((word_val & bit) == 0)
            add_val = jnp.where(fresh, bit, jnp.uint32(0))
            visited = visited.at[qidx[:, None], word_idx].add(add_val)

        if skip_score:
            sims = jnp.where(fresh, -jnp.abs(nbrs_safe.astype(jnp.float32)), NEG_INF)
        elif skip_gather:
            sims = _batched_sims(
                q, jnp.broadcast_to(q[:, None, :], (nq, nbrs.shape[1], d)),
                metric, jnp.broadcast_to(norms[:1], (nq, nbrs.shape[1])), None,
            )
            sims = jnp.where(fresh, sims - nbrs_safe.astype(jnp.float32) * 1e-9, NEG_INF)
        else:
            sims = _batched_sims(q, codes[nbrs_safe], metric, norms[nbrs_safe], None)
            sims = jnp.where(fresh, sims, NEG_INF)
        scanned = scanned + fresh.sum(axis=1, dtype=jnp.int32)

        all_s = jnp.concatenate([cand_s, sims], axis=1)
        all_i = jnp.concatenate([cand_i, jnp.where(fresh, nbrs_safe, -1)], axis=1)
        all_x = jnp.concatenate([cand_x, jnp.zeros_like(sims, dtype=bool)], axis=1)
        new_s, sel = jax.lax.top_k(all_s, ef)
        new_i = jnp.take_along_axis(all_i, sel, 1)
        new_x = jnp.take_along_axis(all_x, sel, 1)
        cand_s = jnp.where(active[:, None], new_s, cand_s)
        cand_i = jnp.where(active[:, None], new_i, cand_i)
        cand_x = jnp.where(active[:, None], new_x, cand_x)

        if not skip_result:
            rids = jnp.where(sims > NEG_INF / 2, nbrs_safe, -1)
            r_all_s = jnp.concatenate([res_s, sims], axis=1)
            r_all_i = jnp.concatenate([res_i, rids], axis=1)
            nr_s, rsel = jax.lax.top_k(r_all_s, res_s.shape[1])
            nr_i = jnp.take_along_axis(r_all_i, rsel, 1)
            res_s = jnp.where(active[:, None], nr_s, res_s)
            res_i = jnp.where(active[:, None], nr_i, res_i)

        return (res_s, res_i, cand_s, cand_i, cand_x, visited, scanned, done, step + 1)

    state = (res_s, res_i, cand_s, cand_i, cand_x, visited, scanned, done, jnp.int32(0))
    res_s, res_i, *_ = jax.lax.while_loop(cond, body, state)
    if skip_result:  # candidates stand in for results (timing only)
        res_s, res_i = cand_s, cand_i
    return res_s[:, :topk], res_i[:, :topk]


def main():
    import zvec_tpu

    zvec_tpu.init()
    log(f"open({COL_DIR})")
    col = zvec_tpu.open(COL_DIR)
    Qa = np.load(os.path.join(WORK, "query.npy"))[:Q]
    gt = np.load(os.path.join(WORK, "gt.npy"))
    gtq = min(gt.shape[0], Q)

    # warm the engine (loads device state)
    col.batch_query("vec", Qa, topk=TOPK, output_fields=[])
    seg = col._impl.segments[0]
    eng = seg.engine_for("vec")
    dev = eng._dev
    codes, norms = eng._codes, eng._norms
    n = eng._n
    budget = jnp.int32(min(max(10_000, int(0.1 * n)), n))  # engine scan-budget formula
    log(f"n={n} codes={codes.shape} l0={dev['l0'].shape} levels={dev['num_levels']}")

    # host-side greedy descent once (shared entry ids for all variants):
    # approximate with the global entry row only — variants all share it, so
    # relative attribution is unaffected.
    entry = int(np.asarray(dev["entry_rows"][0]))
    entry_ids = jnp.full((Q,), entry, dtype=jnp.int32)
    qd = jnp.asarray(Qa.astype(np.float32))

    results = {}

    def run(name, **kw):
        try:
            _run(name, **kw)
        except Exception as e:  # HBM OOM on a fat variant: record and move on
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            log(f"{name}: FAILED {type(e).__name__}")

    def _run(name, **kw):
        fn = jax.jit(partial(
            beam_variant, metric=eng._search_metric, ef=EF, topk=TOPK,
            **kw,
        ))
        t0 = time.time()
        s, i = fn(qd, codes, norms, dev["l0"], entry_ids, budget)
        first = np.asarray(s[:1, :1])  # compile + run
        compile_s = time.time() - t0
        # timed: 2 dispatches, dependent fetch
        t0 = time.perf_counter()
        outs = [fn(qd, codes, norms, dev["l0"], entry_ids, budget) for _ in range(2)]
        np.asarray(jnp.stack([o[0][:1, :1] for o in outs]))
        dt = (time.perf_counter() - t0) / 2
        # recall (only meaningful for functionally-correct variants)
        ids = np.asarray(i)[:gtq]
        hits = sum(
            len(set(ids[r].tolist()) & set(gt[r].tolist())) for r in range(gtq)
        )
        rec = hits / (gtq * TOPK)
        results[name] = {
            "ms_per_batch": round(dt * 1e3, 1),
            "qps": round(Q / dt, 1),
            "recall_at_10": round(rec, 4),
            "compile_s": round(compile_s, 1),
        }
        log(f"{name}: {results[name]}")

    base = dict(max_steps=EF + 64, frontier=4, visited_bits=21)
    run("baseline", **base)
    run("no_dedup", **base, skip_dedup=True)
    run("no_visited", **base, skip_visited=True)
    run("no_result_merge", **base, skip_result=True)
    run("no_gather", **base, skip_gather=True)
    run("no_score", **base, skip_score=True)
    run("visited_u8", **base, visited_u8=True)
    run("frontier2", max_steps=EF + 64, frontier=2, visited_bits=21)
    run("frontier8", max_steps=(EF + 64) // 2, frontier=8, visited_bits=21)
    for s in (48, 64, 96, 128):
        run(f"steps{s}", max_steps=s, frontier=4, visited_bits=21)

    out = os.path.join(WORK, "profile_search.json")
    with open(out, "w") as fh:
        json.dump({"ef": EF, "q": Q, "n": n, "variants": results}, fh, indent=1)
    log(f"written {out}")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
