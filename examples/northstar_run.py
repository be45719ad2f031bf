"""BASELINE config 5: the production-scale cube, mesh-sharded, chosen basis.

Generates a dense synthetic cube, decimates bins irregularly, then runs the
full solver stage (forward rfft over time -> POCS on every frequency slice,
sharded over the device mesh -> inverse rfft) and optional postprocessing,
reporting wall-clock and SNR.

Defaults are the north-star shape (512x512x1024); pass smaller dims for a
CPU smoke run:

    python examples/northstar_run.py --size 64 64 128 --niter 10
    python examples/northstar_run.py --basis SHEARLET          # production basis
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=3, default=(512, 512, 1024),
                    metavar=("NIL", "NXL", "NS"))
    ap.add_argument("--niter", type=int, default=50)
    ap.add_argument("--basis", default="FFT",
                    choices=["FFT", "DCT", "WAVELET", "SHEARLET", "CURVELET"])
    ap.add_argument("--keep", type=float, default=0.5, help="fraction of bins kept")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--postprocess", action="store_true")
    ap.add_argument("--precision", default="highest",
                    choices=["highest", "high", "default"],
                    help="matmul precision (HIGH = bf16x3 is cube-SNR "
                         "neutral and ~1.6x faster; docs/perf.md)")
    ap.add_argument("--pallas", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="use the fused Pallas kernels (folded solve for "
                         "FFT/DCT; VMEM-resident subband kernel for "
                         "SHEARLET/CURVELET) — the production default; "
                         "--no-pallas measures the XLA fallback paths "
                         "(round-5 in-session A/B: 36.3 vs 71.9 s for the "
                         "SHEARLET-HIGH north-star solve)")
    ap.add_argument("--batches-per-launch", type=int, default=16,
                    help="directional bases: fori_loop this many batches "
                         "inside ONE launch — each dispatch RPC over the "
                         "remote tunnel costs ~0.5 s, so 65 per-batch "
                         "launches waste ~30 s; keep each launch under the "
                         "remote worker's ~60-90 s execution ceiling")
    ap.add_argument("--box-precision", default=None,
                    choices=["highest", "high", "default"],
                    help="directional bases: matmul precision of the "
                         "support-cropped box-group stages only (mixed-"
                         "precision probe, docs/perf.md round 4b)")
    ap.add_argument("--no-download", action="store_true",
                    help="directional bases: skip the result download + "
                         "host SNR (rate-only sweeps over the slow tunnel)")
    ap.add_argument("--eps", type=float, default=0.0,
                    help="relative-cost convergence tolerance (0 = run all "
                         "niter; reference production default 1e-16)")
    ap.add_argument("--global-early-stop", action="store_true",
                    help="stop each batch once EVERY slice converged "
                         "(lax.while_loop; disables the fused kernel) "
                         "instead of per-lane freezing — perf.md round 4 "
                         "measurement")
    ap.add_argument("--sweep-k", type=int, nargs="+", default=None,
                    help="directional bases: run the solver stage once per "
                         "batches-per-launch value on the SAME uploaded "
                         "cube (in-session comparison; tunnel timing "
                         "varies too much across runs)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pseudo_3d_interpolation_tpu.utils.compcache import enable_persistent_cache

    enable_persistent_cache()

    from pseudo_3d_interpolation_tpu.models import POCSConfig
    from pseudo_3d_interpolation_tpu.models.transforms import get_transform
    from pseudo_3d_interpolation_tpu.ops import dft, metrics
    from pseudo_3d_interpolation_tpu.ops.cplx import Cplx
    from pseudo_3d_interpolation_tpu.parallel import make_mesh
    from pseudo_3d_interpolation_tpu.parallel.mesh import (
        replicated_sharding, slice_sharding)

    h, w, t = args.size
    print(f"devices: {jax.devices()}")
    mesh = make_mesh()
    print(f"mesh: {dict(mesh.shape)}")

    print(f"building dense synthetic cube {h}x{w}x{t} ...")
    dt = 0.25e-3
    rng = np.random.default_rng(0)
    t_axis = np.arange(t) * dt
    il = np.arange(h)[:, None, None] / h
    xl = np.arange(w)[None, :, None] / w
    cube = np.zeros((h, w, t), np.float32)
    for t0, a, f0 in [(0.15 * t * dt, 1.0, 400.0), (0.4 * t * dt, -0.6, 300.0),
                      (0.7 * t * dt, 0.5, 250.0)]:
        tt = t0 + 0.015 * t * dt * il + 0.01 * t * dt * xl
        arg = (t_axis[None, None, :] - tt) * f0
        cube += (a * np.exp(-(arg**2) * 8) * np.cos(2 * np.pi * arg)).astype(np.float32)
    mask2d = (rng.uniform(size=(h, w)) < args.keep).astype(np.float32)
    obs = cube * mask2d[:, :, None]

    cfg = POCSConfig(niter=args.niter, thresh_op="hard", p_min="adaptive",
                     version="fast", alpha=0.75, eps=args.eps,
                     global_early_stop=args.global_early_stop,
                     transform_kind=args.basis, use_pallas=args.pallas)
    if args.basis in ("WAVELET", "CURVELET"):
        # adaptive tau_min is shearlet-specific (reference POCS.py:302-324)
        cfg = POCSConfig(**{**cfg.__dict__, "p_min": 1e-3})
    tkw = {}
    if args.box_precision:
        if args.basis not in ("SHEARLET", "CURVELET"):
            raise SystemExit(
                f"--box-precision applies to directional bases only "
                f"(SHEARLET/CURVELET), not {args.basis}")
        tkw["box_precision"] = args.box_precision
    transform = get_transform(args.basis, precision=args.precision, **tkw)

    from pseudo_3d_interpolation_tpu.models.pocs import pocs_interpolate
    from pseudo_3d_interpolation_tpu.utils.hoist import jit_hoisted

    slice_sh = slice_sharding(mesh, 3)
    repl = replicated_sharding(mesh)

    if args.basis in ("SHEARLET", "WAVELET", "CURVELET"):
        # multiscale coefficient stacks are too large to materialize for all
        # slices in one jit (50-61 subbands x all slices at 512² is terabytes),
        # so the solve runs in per-batch jit steps — but the SPECTRUM STAYS
        # DEVICE-RESIDENT the whole time: one h2d of the time cube, rfft on
        # device, device-side dynamic slicing per batch, device-side
        # concatenation, irfft on device, one d2h at the end. (Round-2 fix:
        # the previous host-chunked driver moved ~4 GB through the tunnel
        # per run and paid a round-trip latency per batch.)
        nslices = t // 2 + 1
        batch = args.batch
        if mesh.devices.size > 1:
            print(f"NOTE: the directional runner is single-device by design "
                  f"(short donated-buffer launches); the {mesh.devices.size}"
                  "-device mesh is NOT used here — for multi-chip "
                  "directional runs use `p3d pocs` (sharded driver)",
                  flush=True)
        # One jitted launch per batch, everything device-resident between
        # launches. Two constraints shaped this (both measured here):
        # (1) the remote TPU worker kills single executions beyond ~60-90 s
        #     (a whole-cube launch at niter>=35 reproducibly crashes it), so
        #     launches must stay short — a batch of 8 at HIGH is ~2 s;
        # (2) wrapping the per-batch solve in a lax.scan over batches
        #     (pocs_interpolate_scanned) compiles to a ~4x SLOWER program
        #     for the 61-subband shearlet body (441 s vs ~110 s for the
        #     whole cube), so per-batch dispatch beats one big scan.
        # chunk k batches into one launch (~0.5 s of tunnel dispatch per
        # launch saved), with a separate smaller remainder launch instead
        # of padding the whole axis to a k*batch multiple: padded slices
        # run the full solve (eps=0, no early exit), so at 513 slices a
        # single 8x8 chunking wastes 63 slice-solves (~5 s at HIGH) where
        # full-chunks + a one-batch remainder waste only 7
        ks = args.sweep_k or [max(1, args.batches_per_launch)]
        if any(kk < 1 for kk in ks):
            raise SystemExit(f"--sweep-k entries must be >= 1, got {ks}")

        def plan_chunks(kk):
            nfull = nslices // (batch * kk)     # whole kk*batch launches
            rem = nslices - nfull * batch * kk
            k_rem = -(-rem // batch) if rem else 0
            return nfull, k_rem, nfull * batch * kk + k_rem * batch

        # pad once to the largest chunking's extent so every sweep entry
        # reuses the SAME resident spectrum (tunnel timing varies run to
        # run; in-upload sweeps are the only fair comparison)
        npad = max(plan_chunks(kk)[2] for kk in ks)

        @jax.jit
        def fwd(x):
            spec = dft.rfft1(x, axis=-1)
            z = Cplx(jnp.moveaxis(spec.re, -1, 0), jnp.moveaxis(spec.im, -1, 0))
            pad = [(0, npad - nslices), (0, 0), (0, 0)]
            return Cplx(jnp.pad(z.re, pad), jnp.pad(z.im, pad))

        def make_solver(kk):
            @functools.partial(jit_hoisted, donate_argnums=(0,))
            def solve_chunk(rec, z, m, start0):
                def body(i, rc):
                    s = start0 + i * batch
                    zb = Cplx(jax.lax.dynamic_slice_in_dim(z.re, s, batch, 0),
                              jax.lax.dynamic_slice_in_dim(z.im, s, batch, 0))
                    r = pocs_interpolate(zb, m, transform, cfg).data
                    return Cplx(
                        jax.lax.dynamic_update_slice_in_dim(rc.re, r.re, s, 0),
                        jax.lax.dynamic_update_slice_in_dim(rc.im, r.im, s, 0))

                return jax.lax.fori_loop(0, kk, body, rec)

            return solve_chunk

        @functools.partial(jax.jit, donate_argnums=0)
        def inv(rec):
            zi = Cplx(jnp.moveaxis(rec.re[:nslices], 0, -1),
                      jnp.moveaxis(rec.im[:nslices], 0, -1))
            return dft.irfft1(zi, n=t, axis=-1)

        def _sync(a):                  # real wall time on the remote tunnel
            return float(jnp.sum(a[..., :2, :2]))

        t0 = time.time()
        xd = jnp.asarray(obs)          # ONE upload of the time cube
        md = jnp.asarray(mask2d)
        _sync(xd)
        t_up = time.time() - t0
        z_all = fwd(xd)
        del xd
        out = None
        for kk in ks:
            nfull, k_rem, npad_k = plan_chunks(kk)
            solve_chunk = make_solver(kk)
            # k_rem == kk would re-jit an identical program inside the timed
            # region — reuse the chunk solver
            solve_rem = (solve_chunk if k_rem == kk
                         else make_solver(k_rem)) if k_rem else None
            if len(ks) > 1:
                # sweeping: compile OUTSIDE the timed window (one discarded
                # warm launch per program) — over the tunnel a cold
                # directional compile is tens of seconds, which would
                # dominate and misorder the in-session kk comparison the
                # sweep exists for. The single-k production path skips this
                # (a full extra pass would double its runtime; its report
                # states whether it was a first-in-process run).
                warm = Cplx(jnp.zeros_like(z_all.re),
                            jnp.zeros_like(z_all.im))
                warm = solve_chunk(warm, z_all, md, jnp.int32(0))
                if solve_rem is not None and solve_rem is not solve_chunk:
                    warm = solve_rem(warm, z_all, md, jnp.int32(0))
                _sync(warm.re)
                del warm
            t0 = time.time()
            rec = Cplx(jnp.zeros_like(z_all.re), jnp.zeros_like(z_all.im))
            for s in range(0, nfull * batch * kk, batch * kk):
                # rec is donated through every launch: one persistent buffer
                rec = solve_chunk(rec, z_all, md, jnp.int32(s))
            if solve_rem is not None:
                rec = solve_rem(rec, z_all, md, jnp.int32(nfull * batch * kk))
            out = inv(rec)
            _sync(out)
            t_solve = time.time() - t0
            nlaunch = nfull + (1 if k_rem else 0)
            print(f"solver stage (rfft + {nlaunch} launches of <={kk}x{batch} "
                  f"slices + irfft): "
                  f"{t_solve:.1f}s ({nslices * args.niter / t_solve:.0f} "
                  f"slice-iters/s, basis={args.basis})", flush=True)
        if args.no_download:
            print(f"upload {obs.nbytes / 2**20:.0f} MB: {t_up:.1f}s | "
                  f"download skipped (--no-download; rate-only sweep)")
            return
        t0 = time.time()
        out_h = np.asarray(out)        # ONE download of the result
        t_down = time.time() - t0
        print(f"upload {obs.nbytes / 2**20:.0f} MB: {t_up:.1f}s | "
              f"download: {t_down:.1f}s")
        snr_in = float(metrics.snr(np.abs(cube), np.abs(obs)))
        snr_out = float(metrics.snr(np.abs(cube), np.abs(out_h)))
        print(f"SNR: sparse {snr_in:.1f} dB -> reconstructed {snr_out:.1f} dB")
        if args.postprocess:
            _postprocess(out_h, h, w)
        return

    @jax.jit
    def full_chain(x, mask):
        spec = dft.rfft1(x, axis=-1)
        z = Cplx(jnp.moveaxis(spec.re, -1, 0), jnp.moveaxis(spec.im, -1, 0))
        z = Cplx(jax.lax.with_sharding_constraint(z.re, slice_sh),
                 jax.lax.with_sharding_constraint(z.im, slice_sh))
        res = pocs_interpolate(z, mask, transform, cfg)
        zi = Cplx(jnp.moveaxis(res.data.re, 0, -1), jnp.moveaxis(res.data.im, 0, -1))
        out = dft.irfft1(zi, n=t, axis=-1)
        return out, res.n_iterations

    xd = jax.device_put(jnp.asarray(obs), repl)
    md = jax.device_put(jnp.asarray(mask2d), repl)
    truth_d = jax.device_put(jnp.asarray(cube), repl)

    print("compiling + first run ...")
    t0 = time.time()
    out, n_it = full_chain(xd, md)
    _ = float(jnp.sum(out))
    print(f"  {time.time() - t0:.1f}s")

    t0 = time.time()
    out, n_it = full_chain(xd, md)
    _ = float(jnp.sum(out) + jnp.sum(n_it))
    wall = time.time() - t0
    nslices = t // 2 + 1
    print(f"solver stage: {wall:.2f}s  "
          f"({nslices * args.niter / wall:.0f} slice-iters/s, basis={args.basis})")

    # arrays as jit ARGUMENTS, not closure constants: captured constants are
    # embedded in the compile payload, and 2 GB of them blows the remote
    # backend's compile-RPC size limit (HTTP 413)
    snr_fn = jax.jit(metrics.snr)
    snr_in = float(snr_fn(truth_d, xd))
    snr_out = float(snr_fn(truth_d, out))
    print(f"SNR: sparse {snr_in:.1f} dB -> reconstructed {snr_out:.1f} dB")

    if args.postprocess:
        _postprocess(np.asarray(out), h, w)


def _postprocess(out_time, h, w):
    """Footprint-removal stage shared by both solver branches."""
    import time

    import numpy as np

    from pseudo_3d_interpolation_tpu.pipeline.postprocess import (
        apply_kxky_filter, footprint_filter)

    t0 = time.time()
    slices = np.moveaxis(np.asarray(out_time), -1, 0)
    ff = footprint_filter(h, w, sigma=7, direction="both")
    cleaned = apply_kxky_filter(slices, ff)
    print(f"postprocess (footprint removal): {time.time() - t0:.2f}s, "
          f"finite={np.isfinite(cleaned).all()}")


if __name__ == "__main__":
    main()
