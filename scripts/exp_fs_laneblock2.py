"""Second lane-block sweep: u2 at lb512, and 1024-lane serving batches
(8 independent chains in one block vs 2×512 blocks). Also times the
EMPTY kernel at the winning config to re-pin the floor.

Writes bench_out/fs_laneblock2.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHMM = "/root/reference/chmm_files/2405.chmm"
ESS = "/root/reference/ess_files/emit_50_3500_20.ess"
T_LEN = 3500
RUNS = 5

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_out", "fs_laneblock2.json")


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import spec_viterbi_tpu as svt
    from spec_viterbi_tpu.ops.fused_pallas import (
        BIG_THRESHOLD,
        FusedStructuredDecoder,
    )
    from spec_viterbi_tpu.ops.structured import StructuredOperator

    print("devices:", jax.devices(), flush=True)
    hmm = svt.read_hmm(CHMM)
    seqs = svt.read_emit_seq(ESS)
    sop = StructuredOperator.from_hmm(hmm)
    fd = FusedStructuredDecoder(
        sop, hmm.emission_matrix(pad_to=sop.n), hmm.start_vector(pad_to=sop.n)
    )
    base = [np.asarray(s[:T_LEN], dtype=np.int32) for s in seqs]

    def staged(lanes: int, n_batches: int):
        out = []
        for j in range(n_batches):
            batch = [
                np.roll(base[i % len(base)], (j * 131 + i * 7) % T_LEN)
                for i in range(lanes)
            ]
            st, _, masked = fd.prepare(batch)
            assert not masked
            out.append(st)
        return out

    def make_run(lb: int, unroll: int):
        def f(seqs_t):
            v0 = fd.em_clamped[:, :].take(seqs_t[0], axis=1) + fd.pi[:, None]
            obs = seqs_t[1:, None, :]
            chunks, tail = divmod(obs.shape[0], unroll)
            out = v0
            if chunks:
                out = fd._pallas_fs(out, obs[: chunks * unroll], unroll, lane_block=lb)
            if tail:
                out = fd._pallas_fs(out, obs[chunks * unroll :], tail, lane_block=lb)
            return jnp.where(out >= BIG_THRESHOLD, jnp.inf, out)

        return jax.jit(f)

    results = {}

    def timed(run, handles, lanes, n_batches, key, ref=None):
        got = np.asarray(run(handles[0]))
        ok = None if ref is None else bool(np.array_equal(got, ref))
        np.asarray(run(handles[0])[:1, :1])
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            outs = [run(st) for st in handles]
            np.asarray(outs[-1][:1, :1])
            times.append(time.perf_counter() - t0)
        sec = sorted(times)[len(times) // 2]
        results[key] = {
            "equal": ok,
            "msym_per_s": round(n_batches * lanes * T_LEN / sec / 1e6, 2),
            "us_per_step": round(sec * 1e6 / (n_batches * T_LEN), 4),
        }
        print(json.dumps({"name": key, **results[key]}), flush=True)
        return got

    h512 = staged(512, 16)
    ref = np.asarray(make_run(128, 4)(h512[0]))
    timed(make_run(512, 2), h512, 512, 16, "b512_lb512_u2", ref)
    timed(make_run(512, 4), h512, 512, 16, "b512_lb512_u4", ref)

    h1024 = staged(1024, 8)
    ref1k = np.asarray(make_run(128, 4)(h1024[0]))
    timed(make_run(512, 4), h1024, 1024, 8, "b1024_lb512_u4", ref1k)
    timed(make_run(1024, 4), h1024, 1024, 8, "b1024_lb1024_u4", ref1k)

    # empty kernel at the wide block: the irreducible per-step quantum of
    # the winning config (carry RMW + add + store per substep)
    def empty_run(lb: int, unroll: int, b: int, steps: int):
        def kern(seq_ref, o_ref):
            for u in range(unroll):
                o_ref[:] = o_ref[:] + seq_ref[u].astype(jnp.float32)

        @jax.jit
        def f(v0, obs):
            return pl.pallas_call(
                kern,
                grid=(b // lb, steps // unroll),
                in_specs=[
                    pl.BlockSpec((unroll, 1, lb), lambda i, t: (t, 0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((fd.n, lb), lambda i, t: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((fd.n, b), jnp.float32),
                compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
            )(obs)

        return f

    steps = 3496
    obs = [jnp.asarray(np.random.default_rng(j).integers(
        0, 20, size=(steps, 1, 512)).astype(np.int32)) for j in range(16)]
    v0 = jnp.zeros((fd.n, 512), jnp.float32)
    run_e = empty_run(512, 4, 512, steps)
    np.asarray(run_e(v0, obs[0])[:1, :1])
    times = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        outs = [run_e(v0, o) for o in obs]
        np.asarray(outs[-1][:1, :1])
        times.append(time.perf_counter() - t0)
    sec = sorted(times)[len(times) // 2]
    results["empty_lb512_u4"] = {"us_per_step": round(sec * 1e6 / (16 * steps), 4)}
    print(json.dumps({"name": "empty_lb512_u4", **results["empty_lb512_u4"]}),
          flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("FS LANEBLOCK2 COMPLETE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
