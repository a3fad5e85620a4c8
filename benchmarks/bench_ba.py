"""BA speed benchmark: ms per LM iteration at the BASELINE.json operating
points (global BA at ~500-1000 keyframes, 50k-100k landmarks) using the
implicit-Schur PCG solver.

Usage: python benchmarks/bench_ba.py [n_cams] [n_landmarks]
Prints one JSON line: {"metric": "ba_ms_per_iter", ...}."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def main(n_cams=1000, n_lms=100_000, obs_per_lm=6, iters=8, cg_iters=25,
         pallas=1, fused=1, tile=4096, record=False):
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from sfm_tpu.ba import Observations
    from sfm_tpu.ba.large import build_tables, run_large_ba

    rng = np.random.default_rng(0)
    # synthetic loopy trajectory observing a landmark field
    X = np.stack([rng.uniform(-50, 50, n_lms), rng.uniform(-10, 10, n_lms),
                  rng.uniform(20, 60, n_lms)], 1).astype(np.float32)
    K = np.array([[525.0, 0, 320], [0, 525.0, 240], [0, 0, 1]], np.float32)
    cam_t = np.stack([np.linspace(-40, 40, n_cams),
                      np.zeros(n_cams), np.zeros(n_cams)], 1).astype(np.float32)
    # each landmark observed by obs_per_lm nearby cameras
    base = rng.integers(0, n_cams - obs_per_lm, n_lms)
    lm_idx = np.repeat(np.arange(n_lms), obs_per_lm).astype(np.int32)
    cam_idx = (base[:, None] + np.arange(obs_per_lm)[None, :]).reshape(-1)
    cam_idx = cam_idx.astype(np.int32)
    p = X[lm_idx] + cam_t[cam_idx]
    uv = (p[:, :2] / p[:, 2:]) * 525.0 + np.array([320.0, 240.0])
    obs = Observations(jnp.asarray(cam_idx), jnp.asarray(lm_idx),
                       jnp.asarray(uv.astype(np.float32)),
                       jnp.ones(len(cam_idx), jnp.float32))
    nmax = int(np.bincount(cam_idx, minlength=n_cams).max())
    print(f"building tables: {len(cam_idx)} obs, nmax={nmax}",
          file=sys.stderr)
    tables = build_tables(obs, n_cams, n_lms, nmax=nmax, kmax=obs_per_lm)

    plan = None
    if pallas:
        from sfm_tpu.ba.schur_pallas import SchurPlan
        plan = SchurPlan(tables.lm_cam, tables.lm_w, n_cams, tile=tile)
        print(f"SchurPlan: window={plan.window} of Cp={plan.pad_width} "
              f"({plan.pad_width // plan.window}x dot shrink)",
              file=sys.stderr)

    rv0 = jnp.zeros((n_cams, 3)).at[1:].add(0.002)
    tv0 = jnp.asarray(cam_t)
    X0 = jnp.asarray(X) + jnp.asarray(
        rng.normal(0, 0.05, X.shape).astype(np.float32))
    cam_free = jnp.ones(n_cams, bool).at[0].set(False)
    lm_free = jnp.ones(n_lms, bool)

    f = jax.jit(lambda rv, tv, X: run_large_ba(
        jnp.asarray(K), rv, tv, X, tables, cam_free=cam_free,
        lm_free=lm_free, iterations=iters, cg_iterations=cg_iters,
        tol=0.0, pallas_matvec=bool(pallas), schur_plan=plan,
        pallas_tile=tile,
        fused_linearize=bool(pallas and fused)))
    t0 = time.time()
    out = f(rv0, tv0, X0)
    jax.block_until_ready(out)
    print(f"compile+first: {time.time()-t0:.1f}s, accepted "
          f"{int(out[3].accepted)}, cost {float(out[3].initial_cost):.3e} "
          f"-> {float(out[3].final_cost):.3e}", file=sys.stderr)
    # a d2h fetch INSIDE the timed region: on the tunneled device,
    # block_until_ready does not reliably force execution (round 4)
    t0 = time.time()
    out = f(rv0, tv0, X0)
    _ = float(np.asarray(out[3].final_cost))
    total = time.time() - t0
    ms_per_iter = total / iters * 1000

    # bytes-touched roofline: each CG/rhs/backsub apply reads the packed
    # W table once (fused kernel) + writes z/reads x (small); each LM iter
    # runs (cg_iters + 2) applies plus one linearization (~both tables'
    # Jacobian blocks written + read once)
    Lp = (n_lms + 255) // 256 * 256
    wt_mb = Lp * 3 * obs_per_lm * 8 * 4 / 1e6
    applies = cg_iters + 2
    lin_mb = (n_lms * obs_per_lm * (2 + 12 + 6 + 2) * 4
              + n_cams * nmax * (2 + 12 + 6 + 2) * 4) / 1e6
    hbm_gb_s = 700.0  # v5e-class sustained
    roofline_ms = (applies * wt_mb + 3 * lin_mb) / 1e3 / hbm_gb_s * 1e3
    print(f"roofline: W-table {wt_mb:.0f} MB/apply x {applies} applies "
          f"+ linearize ~{lin_mb:.0f} MB -> ~{roofline_ms:.1f} ms/LM-iter "
          f"at {hbm_gb_s:.0f} GB/s HBM; measured {ms_per_iter:.1f} "
          f"({100 * roofline_ms / max(ms_per_iter, 1e-9):.0f}% of roofline)",
          file=sys.stderr)

    if record:
        # the headline "BA ms/iter @ 1k keyframes" metric goes into the
        # single source of truth (VERDICT r3 missing item 3: the number
        # must not live only in a commit message)
        from bench import _record
        _record(
            "ba_1k", "large BA speed (BASELINE metric 2)",
            f"{ms_per_iter:.1f} ms/LM-iter "
            f"({100 * roofline_ms / max(ms_per_iter, 1e-9):.0f}% of HBM "
            "roofline)",
            f"{n_cams} KFs, {n_lms} landmarks, {len(cam_idx)} obs, "
            f"{cg_iters} PCG iters/LM-iter, implicit-Schur + fused Pallas "
            "kernels; roofline = bytes-touched model at 700 GB/s",
            source=f"python benchmarks/bench_ba.py {n_cams} {n_lms}")

    print(json.dumps({
        "metric": "ba_ms_per_iter",
        "value": round(ms_per_iter, 2),
        "unit": f"ms/LM-iter @ {n_cams} KFs, {n_lms} landmarks, "
                f"{len(cam_idx)} obs (incl. {cg_iters} PCG iters each)",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    record = "--record" in sys.argv[1:]
    args = [int(a) for a in sys.argv[1:] if not a.startswith("--")]
    main(*args, record=record)
