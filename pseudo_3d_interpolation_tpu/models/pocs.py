"""POCS sparse-inversion solver family (regular / fast / adaptive), TPU-native.

Re-designs the reference's per-slice Python loop
(pseudo_3D_interpolation/functions/POCS.py:371-661) as one batched
``lax.scan`` over iterations:

    forward transform -> threshold(decay_i) -> inverse transform
    -> masked reinsertion  x = x_rec*(1 - α·mask) + α·x_obs

Key departures from the reference, driven by the hardware:

- **Batched, not per-slice.** The reference solves one 2D slice per dask
  task; here a whole block of frequency slices ``(B, H, W)`` advances in
  lock-step through the scan, so the 2D transforms become large MXU matmul
  batches (see ops/dft.py) and XLA fuses threshold+reinsertion into their
  epilogues.
- **Early stopping as lane freezing.** The reference breaks the Python loop
  at ``cost < eps`` after iteration 3 (POCS.py:631-632). Batched control flow
  cannot break per-lane, so each slice carries an ``active`` flag; converged
  slices freeze (their state stops updating) while the scan runs to ``niter``.
  Effective per-slice iteration counts are reported exactly like the
  reference's ``niterations``.
- **Complex as (re, im) pairs** (ops/cplx.py): TPU backends lack complex.
- **FPOCS = true Nesterov + adaptive restart.** The reference's momentum
  term is identically zero (POCS.py:629 re-aliases x_old every iteration);
  here ``version='fast'`` extrapolates from the real previous iterate and
  applies O'Donoghue & Candès (2015) adaptive restart — on a cost increase
  the momentum is killed and the Nesterov counter reset — which keeps the
  early acceleration AND converges to the regular fixed point (plain
  Nesterov under a decaying threshold plateaus several dB below it; pinned
  by tests/test_reference_parity.py).
- **Telemetry as arrays**, not file appends: per-slice iteration counts,
  final cost, and (optionally) the full cost history are returned to the
  caller (reference appends CSV lines from inside the solver,
  POCS.py:644-651).

Zero slices short-circuit exactly like the reference (POCS.py:515-521):
all-zero inputs report 0 iterations and return zeros.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cplx import Cplx, from_complex, to_complex
from .transforms import get_transform


@dataclasses.dataclass(frozen=True)
class POCSConfig:
    """Solver parameters (defaults match reference functions/POCS.py:379-390
    and the documented production workflow: FPOCS, hard threshold,
    exponential decay, adaptive p_min — docs/3D/3D_cube_interpolation.md)."""

    niter: int = 50
    thresh_op: str = "hard"
    thresh_model: str = "exponential"
    # eps=0.0: run all niter iterations (no early stop). This is what YAML
    # configs omitting 'eps:' resolve to via pipeline/pocs.config_from_yaml,
    # so it must match the CLI/pipeline default: the measured quality-safe
    # choice (loose eps loses up to 8 dB cube SNR — docs/perf.md round 4d)
    # and the only value eligible for the fused folded kernel + auto
    # pad_to_tile policy.
    eps: float = 0.0
    alpha: float = 1.0
    p_max: float = 0.99
    p_min: Any = 1e-5
    sqrt_decay: bool = False
    decay_kind: str = "values"
    version: str = "regular"  # regular | fast | adaptive
    transform_kind: str = "FFT"
    keep_cost_history: bool = False
    # stop the whole batch once EVERY slice has converged (lax.while_loop
    # instead of a fixed scan): saves the tail iterations when eps is
    # realistic, at the price of no cost history and a per-iteration
    # all-reduce of the active flags
    global_early_stop: bool = False
    # folded Pallas solve (FFT/DCT bases, hard/soft threshold, square %128
    # slices, shared 2D mask, DEFAULT/HIGHEST precision); falls back to the
    # XLA path when unsupported
    use_pallas: bool = False
    pallas_interpret: bool = False  # interpret mode for CPU testing
    # cube drivers (parallel/solver.interpolate_cube[_resident]) zero-pad
    # slices spatially to the next 128-multiple before the solve (observed-
    # zero frame: amplitude 0, mask 1 — utils/pad.pad_slices_to_tile) and
    # crop after, so arbitrary survey grids ride the fused Pallas kernels
    # (which require %128 sides). The transform sees the padded grid, so
    # numerics differ slightly from the unpadded solve. Tri-state:
    # None (default) = AUTO — engage when the measured policy says the
    # padded kernel beats the XLA fallback (pad-area ratio <= 1.3,
    # utils/pad.auto_pad_to_tile); True/False force/forbid it.
    pad_to_tile: bool | None = None


class POCSResult(NamedTuple):
    data: Cplx  # reconstructed slices, same shape as input
    n_iterations: jnp.ndarray  # (*batch,) int32 — effective iterations per slice
    cost: jnp.ndarray  # (*batch,) f32 — final cost per slice
    cost_history: jnp.ndarray | None  # (niter, *batch) if requested


def _wavelet_cascade_aligned(n: int, level: int, interpret: bool) -> bool:
    """Whether the fused wavelet kernel's Mallat cascade is legal at this
    size: every in-kernel slice/concat boundary is n >> lv =
    (n >> (level-1)) << (level-1-lv), so the deepest block must both fill an
    MXU tile and be a 128-lane multiple — which aligns all shallower
    boundaries too. 640² at level 3 gives 160: >= 128 but NOT
    Mosaic-alignable, so it must fall back to the XLA path. Interpret mode
    (CPU tests) lifts the tile floor to the 8-sublane granule."""
    align = 8 if interpret else 128
    deepest = n >> (level - 1)
    return deepest > 0 and deepest % align == 0


class SolverRoute(NamedTuple):
    """Resolved solver path for a (shape, mask, config, transform) combo.

    ``route`` is one of:
      - ``'fused-folded'``: the whole solve in ONE Pallas launch per batch
        (ops/pallas/pocs_iter.pocs_solve_fused)
      - ``'fused-periter'``: XLA scan driving the one-iteration Pallas
        kernel (history/early-stop configs on the FFT basis)
      - ``'streamed-subband'``: directional (SHEARLET/CURVELET) scan whose
        subband/box kernels engage inside ops/shearlet.py per plan group
      - ``'xla-scan'``: the pure-XLA batched scan
    ``basis``: folded-kernel basis ('fft'/'dct'/'wavelet', '' otherwise).
    ``reason``: the FIRST failed fused-kernel gate condition ('' when the
    folded kernel runs). The cube drivers log this line so silent
    fallbacks are visible (the round-4 eps incident — default CLI runs
    quietly ineligible for the folded kernel — cost ~30% and slipped
    past review; tests/test_pallas_kernel.py asserts the route for the
    CLI-default config).
    """

    route: str
    basis: str
    reason: str


def solver_route(shape, mask_shape, config: POCSConfig,
                 transform=None) -> SolverRoute:
    """THE solver-path decision for :func:`pocs_interpolate`.

    ``pocs_interpolate`` dispatches on this function's result and the cube
    drivers log it — one implementation, so the log can never drift from
    the dispatch. ``shape``/``mask_shape`` are the slice-batch and mask
    shapes; ``transform`` is the (already shape-resolved) transform
    instance, or None to resolve from ``config.transform_kind``.
    """
    cfg = config
    if transform is None:
        transform = get_transform(cfg.transform_kind)
    if hasattr(transform, "with_shape"):
        transform = transform.with_shape(tuple(shape))
    from .transforms import DCTTransform, FFTTransform, WaveletTransform

    op = "garrote" if cfg.thresh_op == "garotte" else cfg.thresh_op
    h, w = int(shape[-2]), int(shape[-1])
    batch_ndim = len(shape) - 2
    directional = hasattr(transform, "apply_threshold")

    def _fallback(reason: str, basis: str = "") -> SolverRoute:
        if directional:
            return SolverRoute("streamed-subband", basis, reason)
        return SolverRoute("xla-scan", basis, reason)

    if not cfg.use_pallas:
        return _fallback("use_pallas=False")

    from ..ops.pallas.pocs_iter import (_KERNEL_THRESH_OPS,
                                        tpu_lowering_available)

    if directional:
        # the per-group subband/box kernel decisions live in
        # ops/shearlet.py (they depend on the plan); report the
        # top-level shape/op/backend gate they all share
        from ..ops.pallas.subband import subband_supported

        if subband_supported(shape, op, cfg.pallas_interpret):
            return SolverRoute("streamed-subband", "", "")
        if op not in _KERNEL_THRESH_OPS:
            return SolverRoute(
                "streamed-subband", "",
                f"threshold {cfg.thresh_op!r} has no kernel "
                "(hard/soft/garrote only)")
        if not tpu_lowering_available(cfg.pallas_interpret):
            return SolverRoute(
                "streamed-subband", "",
                f"backend {jax.default_backend()!r} has no Mosaic "
                "lowering (TPU only)")
        return SolverRoute("streamed-subband", "",
                           f"slice sides {h}x{w} not both %128")

    if isinstance(transform, (FFTTransform, DCTTransform)):
        basis = "dct" if isinstance(transform, DCTTransform) else "fft"
        wavelet_ok = True
    elif isinstance(transform, WaveletTransform):
        basis = "wavelet"
        wavelet_ok = (
            transform.target is None
            and h == w
            and _wavelet_cascade_aligned(w, transform.level,
                                         cfg.pallas_interpret))
    else:
        return _fallback(
            f"transform {getattr(transform, 'kind', type(transform).__name__)!r}"
            " has no fused kernel")

    # shared eligibility gate, first-failure order mirrors the historical
    # inline checks exactly
    full_mask = (len(mask_shape) == 2
                 and tuple(mask_shape) == (shape[-2], shape[-1]))
    if not full_mask:
        return _fallback("mask must be the exact 2-D (H, W) slice mask",
                         basis)
    if batch_ndim != 1:
        return _fallback(f"batch must be 1-D (got {batch_ndim}-D leading "
                         "axes)", basis)
    if op not in _KERNEL_THRESH_OPS:
        return _fallback(f"threshold {cfg.thresh_op!r} has no kernel "
                         "(hard/soft/garrote only)", basis)
    if not tpu_lowering_available(cfg.pallas_interpret):
        return _fallback(f"backend {jax.default_backend()!r} has no Mosaic "
                         "lowering (TPU only)", basis)
    if h % 128 or w % 128:
        return _fallback(f"slice sides {h}x{w} not both %128", basis)
    if basis == "wavelet" and not wavelet_ok:
        return _fallback(
            "wavelet cascade not kernel-eligible (needs square slices, "
            "no resize target, and 128-aligned cascade boundaries — "
            f"n={w}, level={transform.level})", basis)

    # folded-solve-only conditions; an FFT basis that fails them still
    # rides the per-iteration kernel inside the scan
    def _periter(reason: str) -> SolverRoute:
        if basis == "fft":
            return SolverRoute("fused-periter", basis, reason)
        return _fallback(reason, basis)

    if cfg.eps != 0.0:
        return _periter(f"eps={cfg.eps!r} != 0.0 (early stopping needs the "
                        "scan)")
    if cfg.keep_cost_history:
        return _periter("keep_cost_history=True")
    if cfg.global_early_stop:
        return _periter("global_early_stop=True")
    if cfg.version not in ("regular", "fast"):
        return _periter(f"version={cfg.version!r} (folded kernel supports "
                        "regular/fast)")
    return SolverRoute("fused-folded", basis, "")


def describe_route(route: SolverRoute) -> str:
    """One-line human description of a :class:`SolverRoute` for driver logs."""
    name = route.route + (f"[{route.basis}]" if route.basis else "")
    if route.reason:
        return f"{name} — fused-kernel fallback: {route.reason}"
    return name


def pocs_interpolate(
    z: Cplx,
    mask: jnp.ndarray,
    transform=None,
    config: POCSConfig = POCSConfig(),
) -> POCSResult:
    """Run POCS on a batch of slices.

    Parameters
    ----------
    z
        Sparse observed data as a ``Cplx`` pair, shape ``(..., H, W)``
        (leading axes batch independent slices; real data uses a zero
        imaginary part).
    mask
        Sampling mask (1 = observed, 0 = missing), shape broadcastable to
        ``z`` (typically ``(H, W)`` shared or ``(..., H, W)``).
    transform
        A transform object (see models/transforms.py); defaults to the
        config's ``transform_kind``.

    Trace-once: this function is pure and shape-static — wrap in ``jax.jit``
    (or use the pre-jitted :func:`pocs_interpolate_jit`).

    Note: ``config.pad_to_tile`` is a *driver-level* option, honored by the
    cube drivers (parallel/solver.interpolate_cube[_resident]) which pad
    host-side before calling in; at this layer the slices are solved at
    exactly the shape given (non-%128 shapes take the XLA path).
    """
    cfg = config
    if transform is None:
        transform = get_transform(cfg.transform_kind)
    if hasattr(transform, "with_shape"):
        transform = transform.with_shape(z.shape)

    batch_shape = z.shape[:-2]
    mask_in = jnp.asarray(mask, z.dtype)
    # normalize threshold_pair's accepted 'garotte' alias ONCE: every
    # kernel-eligibility gate downstream (the folded kernels here, the
    # fused subband kernel behind apply_threshold) dispatches on the
    # canonical spelling — the raw alias would silently drop those paths
    fused_op = "garrote" if cfg.thresh_op == "garotte" else cfg.thresh_op
    # the ONE solver-path decision (gates on the transform actually in
    # use, the exact 2-D mask shape — the kernels read a full (H, W) mask
    # block, a merely broadcastable mask would read out of bounds — the
    # batch rank, the threshold kind, the backend, and the %128 tiles);
    # the cube drivers log this same route, see solver_route's docstring
    route = solver_route(z.shape, mask_in.shape, cfg, transform)
    use_fused = (route.basis in ("fft", "dct")
                 and route.route in ("fused-folded", "fused-periter"))
    use_fused_wavelet = (route.basis == "wavelet"
                        and route.route == "fused-folded")
    fused_basis = route.basis if route.basis in ("fft", "dct") else "fft"
    fused_precision = None
    if use_fused or use_fused_wavelet:
        from .transforms import _resolve_precision

        # All three precisions run in-kernel: Mosaic lowers DEFAULT and
        # HIGHEST natively; HIGH (bf16x3) has no Mosaic dot lowering, so
        # the kernel implements the 3-pass error-corrected decomposition
        # by hand (ops/pallas/pocs_iter.py::_solve_kernel).
        fused_precision = _resolve_precision(
            getattr(transform, "precision", None))
    mask = jnp.broadcast_to(mask_in, z.shape)
    alpha = jnp.asarray(cfg.alpha, z.dtype)

    # --- one-time decay schedule from the initial forward transform;
    # spectral-stack bases derive it via streamed reductions instead of a
    # materialized (B, L, H, W) forward (same numbers, far less HBM) ---
    if hasattr(transform, "decay_from_input"):
        decay_tree = transform.decay_from_input(
            z, cfg.thresh_model, cfg.niter, cfg.p_max, cfg.p_min,
            cfg.decay_kind)
    else:
        coeffs0 = transform.forward(z)
        decay_tree = transform.decay(
            coeffs0, cfg.thresh_model, cfg.niter, cfg.p_max, cfg.p_min,
            cfg.decay_kind
        )
    if cfg.sqrt_decay:
        decay_tree = jax.tree.map(jnp.sqrt, decay_tree)

    iters = jnp.arange(cfg.niter, dtype=jnp.int32)

    # --- fully fused Pallas solve: the whole fixed-iteration solve in one
    # kernel launch per slice (x and x_prev stay VMEM-resident across all
    # iterations), FFT and DCT bases. Measured on v5e at 512² batch 32:
    # 3.4x the XLA scan at FFT/DEFAULT, +28% at FFT/HIGHEST, +11% at
    # DCT/HIGHEST, ~10x faster compiles (docs/perf.md). Requires no early
    # stopping / history (telemetry reduces to the final cost, which the
    # kernel reports identically to the scan's).
    if route.route == "fused-folded":
        from ..ops.pallas import pocs_solve_fused

        if use_fused_wavelet:
            from ..ops import wavelet as wv

            n = z.shape[-1]
            mats = [wv.dwt_matrix(n >> j, transform.wavelet)
                    for j in range(transform.level)]
            # flatten the decay tree [zero, det_L, ..., det_1] with leaves
            # (niter, B) into (niter, B, 3·level) deepest-first (cH, cV, cD)
            # — the layout pocs_solve_fused's wavelet basis consumes
            flat_decay = jnp.stack(
                [leaf for det in decay_tree[1:] for leaf in det], axis=-1)
            result, cost = pocs_solve_fused(
                z, mask_in, flat_decay, alpha=cfg.alpha,
                thresh_op=fused_op, version=cfg.version,
                interpret=cfg.pallas_interpret, precision=fused_precision,
                basis="wavelet", wavelet_mats=mats,
            )
        else:
            result, cost = pocs_solve_fused(
                z, mask_in, decay_tree, alpha=cfg.alpha,
                thresh_op=fused_op, version=cfg.version,
                interpret=cfg.pallas_interpret, precision=fused_precision,
                basis=fused_basis,
            )
        nonzero = jnp.sum(z.abs2(), axis=(-2, -1)) > 0
        nz = nonzero[..., None, None]
        x_out = Cplx(jnp.where(nz, result.re, z.re),
                     jnp.where(nz, result.im, z.im))
        n_eff = jnp.where(nonzero, cfg.niter, 0).astype(jnp.int32)
        cost = jnp.where(nonzero, cost, 0.0)
        return POCSResult(x_out, n_eff, cost, None)

    keep_mask_f = 1.0 - alpha * mask  # reinsertion weights, reused every iter
    alpha_x = Cplx(alpha * z.re, alpha * z.im)

    def reinsert(x_rec: Cplx) -> Cplx:
        return Cplx(x_rec.re * keep_mask_f + alpha_x.re, x_rec.im * keep_mask_f + alpha_x.im)

    def one_iter(carry, xs):
        x_prev, x_curr, active, n_eff, cost_prev, v = carry
        i, decay_i = xs

        # per-lane Nesterov schedule (v resets on restart, so it is carried
        # per slice rather than precomputed)
        v1 = (1.0 + jnp.sqrt(1.0 + 4.0 * v * v)) / 2.0
        frac = ((v - 1.0) / (v1 + 1.0))[..., None, None]

        if cfg.version == "regular":
            x_input = x_curr
        elif cfg.version == "fast":
            # Correct Nesterov/FPOCS extrapolation y_k = x_k + frac·(x_k − x_{k−1})
            # with O'Donoghue & Candès (2015) adaptive restart (see below).
            # NOTE deviation: the reference re-aliases x_old = x_inv at the end
            # of every iteration (POCS.py:629), which makes its momentum term
            # identically zero — reference "fast" degenerates to "regular".
            # We keep the true previous iterate so FPOCS actually accelerates.
            x_input = Cplx(
                x_curr.re + frac * (x_curr.re - x_prev.re),
                x_curr.im + frac * (x_curr.im - x_prev.im),
            )
        elif cfg.version == "adaptive":
            # reference: POCS.py:572-576 (x_old there == current iterate)
            x_input = Cplx(
                alpha * z.re + keep_mask_f * x_curr.re + (1 - alpha) * (z.re - mask * x_curr.re),
                alpha * z.im + keep_mask_f * x_curr.im + (1 - alpha) * (z.im - mask * x_curr.im),
            )
        else:
            raise ValueError(f"unknown POCS version {cfg.version!r}")

        if route.route == "fused-periter":
            # the per-iteration kernel implements DFT math only; DCT configs
            # that miss the folded path run the XLA branch below
            from ..ops.pallas import pocs_iteration_fused

            x_rec = pocs_iteration_fused(
                x_input, z, mask_in, decay_i, alpha=cfg.alpha,
                thresh_op=fused_op, interpret=cfg.pallas_interpret,
                precision=fused_precision,
            )
        elif hasattr(transform, "apply_threshold"):
            # spectral-stack bases (SHEARLET/CURVELET): fused streamed
            # update — identical numerics to forward/threshold/inverse but
            # never materializes the (B, L, H, W) coefficient stack in HBM
            # (the directional solve measures memory-bound otherwise).
            # cfg.use_pallas additionally routes full-size subbands through
            # the VMEM-resident kernel (ops/pallas/subband.py)
            x_rec = reinsert(
                transform.apply_threshold(
                    x_input, decay_i, fused_op,
                    use_pallas=cfg.use_pallas,
                    pallas_interpret=cfg.pallas_interpret))
        else:
            coeffs = transform.forward(x_input)
            coeffs = transform.threshold(coeffs, decay_i, fused_op)
            x_rec = reinsert(transform.inverse(coeffs))

        # cost (Gao et al. 2013): (Σ(|x_new| − |x_curr|))² / (Σ|x_new|)²
        # per-slice reduction over the trailing two axes (reference POCS.py:622)
        d = jnp.sum(x_rec.abs() - x_curr.abs(), axis=(-2, -1))
        s = jnp.sum(x_rec.abs(), axis=(-2, -1))
        cost = (d * d) / jnp.where(s == 0, 1.0, s * s)

        # adaptive restart (O'Donoghue & Candès 2015): a cost increase means
        # the momentum extrapolation overshot (the decaying-threshold
        # objective moved) — kill it by re-aliasing x_prev to the NEW iterate
        # and resetting the Nesterov counter. Measured: keeps FPOCS's early
        # acceleration AND converges to the regular fixed point instead of
        # plateauing ~6 dB below it (tests/test_reference_parity.py).
        if cfg.version == "fast":
            restart = cost > cost_prev
            rs = restart[..., None, None]
            prev_cand = Cplx(jnp.where(rs, x_rec.re, x_curr.re),
                             jnp.where(rs, x_rec.im, x_curr.im))
            v_next = jnp.where(restart, 1.0, v1)
        else:
            prev_cand = x_curr
            v_next = v1

        # freeze converged lanes
        act = active[..., None, None]
        x_prev_next = Cplx(
            jnp.where(act, prev_cand.re, x_prev.re),
            jnp.where(act, prev_cand.im, x_prev.im),
        )
        x_curr_next = Cplx(
            jnp.where(act, x_rec.re, x_curr.re), jnp.where(act, x_rec.im, x_curr.im)
        )
        n_eff = n_eff + active.astype(jnp.int32)
        cost_out = jnp.where(active, cost, cost_prev)
        v_out = jnp.where(active, v_next, v)
        # reference breaks AFTER keeping the converged iteration (POCS.py:631)
        active_next = active & ~((i > 2) & (cost < cfg.eps))

        new_carry = (x_prev_next, x_curr_next, active_next, n_eff, cost_out, v_out)
        ys = cost_out if cfg.keep_cost_history else None
        return new_carry, ys

    active0 = jnp.ones(batch_shape, bool)
    n0 = jnp.zeros(batch_shape, jnp.int32)
    # cost carry starts at +inf so the restart test (cost > cost_prev) can
    # never fire on the first iteration; it is overwritten by the first
    # iteration's real cost before anything reads it
    c0 = jnp.full(batch_shape, jnp.inf, z.dtype)
    v0 = jnp.ones(batch_shape, z.dtype)
    carry0 = (z, z, active0, n0, c0, v0)

    if cfg.global_early_stop and not cfg.keep_cost_history:
        def wl_cond(state):
            i, carry = state
            return (i < cfg.niter) & jnp.any(carry[2])

        def wl_body(state):
            i, carry = state
            xs_i = jax.tree.map(lambda a: jax.lax.dynamic_index_in_dim(
                a, i, axis=0, keepdims=False), (iters, decay_tree))
            carry, _ = one_iter(carry, xs_i)
            return i + 1, carry

        _, (x_prev, x_inv, active, n_eff, cost, _v) = jax.lax.while_loop(
            wl_cond, wl_body, (jnp.int32(0), carry0)
        )
        history = None
    else:
        (x_prev, x_inv, active, n_eff, cost, _v), history = jax.lax.scan(
            one_iter, carry0, (iters, decay_tree)
        )

    # zero-input short-circuit (reference POCS.py:515-521)
    nonzero = jnp.sum(z.abs2(), axis=(-2, -1)) > 0
    nz = nonzero[..., None, None]
    x_out = Cplx(jnp.where(nz, x_inv.re, z.re), jnp.where(nz, x_inv.im, z.im))
    n_eff = jnp.where(nonzero, n_eff, 0)
    cost = jnp.where(nonzero, cost, 0.0)

    return POCSResult(x_out, n_eff, cost, history if cfg.keep_cost_history else None)


# --- named variants mirroring the reference's partials (POCS.py:659-661) ---
def pocs(z, mask, transform=None, config=POCSConfig()):
    return pocs_interpolate(z, mask, transform, dataclasses.replace(config, version="regular"))


def fpocs(z, mask, transform=None, config=POCSConfig()):
    return pocs_interpolate(z, mask, transform, dataclasses.replace(config, version="fast"))


def apocs(z, mask, transform=None, config=POCSConfig()):
    return pocs_interpolate(z, mask, transform, dataclasses.replace(config, version="adaptive"))


import functools


@functools.lru_cache(maxsize=64)
def _jitted_solver(transform, config: POCSConfig):
    """jit cache keyed on (transform, config) so repeated host-boundary
    calls don't retrace. Large plan constants (directional window stacks,
    DFT matrices) ride as runtime parameters, not inline HLO literals
    (utils/hoist.py) — keeps remote-compile payloads bounded."""
    from ..utils.hoist import jit_hoisted
    return jit_hoisted(lambda zz, mm: pocs_interpolate(zz, mm, transform, config))


def pocs_interpolate_numpy(x, mask, config: POCSConfig = POCSConfig(), transform=None):
    """Host-boundary convenience: numpy (complex or real) in/out, jitted solve.

    Returns ``(x_inv, n_iterations, cost)`` as numpy arrays; preserves real
    input dtype by dropping the imaginary part, matching the reference's
    complex-aware return (POCS.py:653-656).
    """
    was_complex = np.iscomplexobj(x)
    z = from_complex(np.asarray(x))
    tr = transform if transform is not None else get_transform(config.transform_kind)
    res = _jitted_solver(tr, config)(z, jnp.asarray(np.asarray(mask, np.float32)))
    out = to_complex(res.data) if was_complex else np.asarray(res.data.re)
    return out, np.asarray(res.n_iterations), np.asarray(res.cost)
