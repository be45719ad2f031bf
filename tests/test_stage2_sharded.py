"""Sharded end-to-end stage-2 parity on the 8-device virtual mesh.

The whole stage-2 span binning -> preprocess -> FFT -> POCS -> IFFT ->
postprocess -> export runs with the FFT/POCS/IFFT core device-resident and
sharded over the mesh (pipeline/stage2.py; XLA all_to_all at the layout
boundaries) and the results diff against the single-device chain down to
the final exported SEG-Y traces. Matches the reference running its whole
stage 2 under one dask cluster (cube_POCS_interpolation_3D.py:291-340).
"""

import numpy as np

from pseudo_3d_interpolation_tpu.io.segy import SegyFile
from pseudo_3d_interpolation_tpu.models.pocs import POCSConfig
from pseudo_3d_interpolation_tpu.parallel import make_mesh
from pseudo_3d_interpolation_tpu.pipeline.binning import BinningGeometry, bin_cube
from pseudo_3d_interpolation_tpu.pipeline.export import cube_to_segy
from pseudo_3d_interpolation_tpu.pipeline.fft import apply_fft
from pseudo_3d_interpolation_tpu.pipeline.ifft import apply_ifft
from pseudo_3d_interpolation_tpu.pipeline.pocs import interpolate
from pseudo_3d_interpolation_tpu.pipeline.postprocess import postprocess
from pseudo_3d_interpolation_tpu.pipeline.preprocess import preprocess
from pseudo_3d_interpolation_tpu.pipeline.stage2 import (
    interpolate_time_cube_sharded,
)

from test_stage1 import make_profile


def _binned_cube(tmp_path, n_lines=12, ntr=24, ns=64, spacing=10.0):
    """Tiny synthetic survey -> step-10 binned cube with missing ilines."""
    rng = np.random.default_rng(7)
    survey = tmp_path / "survey"
    survey.mkdir()
    acquired = sorted({0, n_lines - 1} | {
        int(i) for i in rng.choice(n_lines, size=int(n_lines * 0.7),
                                   replace=False)})
    for i in acquired:
        floor = 8.0 + 1.2 * np.sin(0.5 * i) + 0.8 * np.cos(0.4 * np.arange(ntr))
        make_profile(str(survey / f"line{i:02d}.sgy"), ntr=ntr, ns=ns,
                     dt_us=250, delrt_ms=0, seafloor_ms=floor, seed=100 + i,
                     x0=500000.0 + i * spacing, y0=5.9e6,
                     heading=(0.0, 1.0), spacing=spacing)
    geom = BinningGeometry(
        spacing=spacing,
        extent=(500000.0, 500000.0 + n_lines * spacing,
                5.9e6, 5.9e6 + ntr * spacing),
        stacking_method="average")
    return bin_cube(str(survey), geom)


def test_stage2_sharded_end_to_end(tmp_path):
    cube = _binned_cube(tmp_path)
    pp = preprocess(cube, balance="rms")
    cfg = POCSConfig(niter=10, thresh_op="hard", thresh_model="exponential",
                     p_min=1e-3, version="fast", alpha=0.75, eps=0.0)

    # chain A: host-driven steps 12-14 with a genuinely single-device solve
    freq = apply_fft(pp)
    interp = interpolate(freq, cfg, mesh=make_mesh(1), batch=8)
    back = apply_ifft(interp, var="freq_amp_interp")
    v = next(x for x in back.data_vars if x not in ("fold", "amp_ref"))

    # chain B: the same span device-resident, sharded over all 8 devices
    mesh = make_mesh()
    back_sh = interpolate_time_cube_sharded(pp, cfg, mesh=mesh)

    a, b = np.asarray(back[v]), np.asarray(back_sh[v])
    assert a.shape == b.shape
    scale = float(np.abs(a).max())
    np.testing.assert_allclose(b, a, atol=2e-5 * scale, rtol=1e-4)
    # telemetry parity (eps=0 -> both chains run the full iteration budget)
    assert (back_sh.attrs["pocs_mean_iterations"]
            == interp.attrs["pocs_mean_iterations"])
    np.testing.assert_array_equal(np.asarray(back_sh.coords["twt"]),
                                  np.asarray(back.coords["twt"]))

    # steps 15-16 on both chains: the exported SEG-Y traces agree
    segys = []
    for tag, c, vv in (("a", back, v), ("b", back_sh, v)):
        if "fold" not in c.data_vars:
            c.data_vars["fold"] = cube.data_vars["fold"]
        post = postprocess(c, var=vv, smoothing={"sigma": 0.8}, agc_win=0.004)
        pv = next(x for x in post.data_vars if x not in ("fold", "amp_ref"))
        path = str(tmp_path / f"final_{tag}.sgy")
        cube_to_segy(post, path, var=pv)
        segys.append(path)
    with SegyFile(segys[0]) as f:
        ta, sort_a = f.trace_data(), f.bin["SortingCode"]
    with SegyFile(segys[1]) as f:
        tb, sort_b = f.trace_data(), f.bin["SortingCode"]
    assert sort_a == sort_b == 4
    assert ta.shape == tb.shape
    np.testing.assert_allclose(tb, ta, atol=2e-4 * np.abs(ta).max(), rtol=1e-3)


def test_stage2_sharded_freq_filter_drop(tmp_path):
    """Lowpass + drop_filtered parity: the sharded span carries the reduced
    bin set through the solve and reconstructs via the stored nfft."""
    cube = _binned_cube(tmp_path, n_lines=10, ntr=16, ns=64)
    pp = preprocess(cube, balance="rms")
    cfg = POCSConfig(niter=6, p_min=1e-3, version="fast", eps=0.0)
    # dt=0.25 ms -> Nyquist 2000 Hz; keep a 0-1200 Hz passband
    fargs = dict(filter_type="lowpass", filter_freqs=[1000.0, 1200.0],
                 drop_filtered=True)

    freq = apply_fft(pp, **fargs)
    assert len(np.asarray(freq.coords["freq_twt"])) < 33  # bins were dropped
    interp = interpolate(freq, cfg, mesh=make_mesh(1), batch=8)
    back = apply_ifft(interp, var="freq_amp_interp")
    v = next(x for x in back.data_vars if x not in ("fold", "amp_ref"))

    back_sh = interpolate_time_cube_sharded(pp, cfg, mesh=make_mesh(), **fargs)
    a, b = np.asarray(back[v]), np.asarray(back_sh[v])
    np.testing.assert_allclose(b, a, atol=2e-5 * np.abs(a).max(), rtol=1e-4)


def test_stage2_sharded_pad_to_tile_parity(tmp_path):
    """The sharded span applies the SAME pad_to_tile policy as the
    single-device drivers: on a non-%128 grid with padding forced, both
    chains solve the identical observed-zero-framed problem and agree."""
    import jax.numpy as jnp  # noqa: F401  (jax initialized by conftest)

    from pseudo_3d_interpolation_tpu.io.ncio import Cube

    rng = np.random.default_rng(23)
    il, xl, nt = 120, 120, 32  # pad-area 1.14x — inside the auto-win region
    amp = rng.normal(size=(il, xl, nt)).astype(np.float32)
    fold = (rng.uniform(size=(il, xl)) < 0.6).astype(np.int32)
    amp *= fold[:, :, None]
    cube = Cube(
        coords={"iline": np.arange(il), "xline": np.arange(xl),
                "twt": np.arange(nt) * 0.25e-3},
        data_vars={"amp": (("iline", "xline", "twt"), amp),
                   "fold": (("iline", "xline"), fold)})
    cfg = POCSConfig(niter=4, p_min=1e-3, version="fast", eps=0.0,
                     use_pallas=True, pallas_interpret=True)
    from pseudo_3d_interpolation_tpu.utils.pad import auto_pad_to_tile

    assert auto_pad_to_tile(cfg, il, xl)  # policy engages on this grid

    freq = apply_fft(cube)
    interp = interpolate(freq, cfg, mesh=make_mesh(1), batch=8)
    back = apply_ifft(interp, var="freq_amp_interp")

    back_sh = interpolate_time_cube_sharded(cube, cfg, mesh=make_mesh())
    a, b = np.asarray(back["amp"]), np.asarray(back_sh["amp"])
    assert a.shape == b.shape == (il, xl, nt)
    np.testing.assert_allclose(b, a, atol=2e-5 * np.abs(a).max(), rtol=1e-4)
