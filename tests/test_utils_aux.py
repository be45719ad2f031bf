"""Direct coverage for the observability utilities (logging / timing /
persistent compile cache) — the reference's utils.py:xprint family and
timeit/profile decorators (SURVEY.md §2.1 utils.py, §5.1/§5.5)."""

import os
import sys

import pytest


def test_xprint_verbosity_and_kinds(capsys):
    from pseudo_3d_interpolation_tpu.utils.logging import set_verbosity, xprint

    set_verbosity(1)
    xprint("info shows", kind="info", verbosity=1)
    xprint("debug hidden", kind="debug", verbosity=1)
    xprint("warn shows", kind="warning", verbosity=1)
    out = capsys.readouterr().out
    assert "info shows" in out and "warn shows" in out
    assert "debug hidden" not in out
    # verbosity 0 silences info
    xprint("quiet", kind="info", verbosity=0)
    assert "quiet" not in capsys.readouterr().out


def test_clean_log_file_strips_ansi(tmp_path):
    from pseudo_3d_interpolation_tpu.utils.logging import clean_log_file

    p = tmp_path / "run.log"
    p.write_text("\x1b[32m[SUCCESS]\x1b[0m done\nplain line\n")
    clean_log_file(str(p))
    text = p.read_text()
    assert "\x1b" not in text and "done" in text and "plain line" in text


def test_redirect_stdout_to_file(tmp_path):
    from pseudo_3d_interpolation_tpu.utils.logging import redirect_stdout_to_file

    p = tmp_path / "out.log"
    with redirect_stdout_to_file(str(p)):
        print("captured")
    assert "captured" in p.read_text()


def test_timeit_and_block_timer(capsys):
    from pseudo_3d_interpolation_tpu.utils.logging import set_verbosity
    from pseudo_3d_interpolation_tpu.utils.timing import block_timer, timeit

    set_verbosity(2)
    try:
        @timeit(label="unit-test-fn", verbosity=2)
        def f(x):
            return x + 1

        assert f(1) == 2
        with block_timer("unit-test-block", verbose=True) as bt:
            pass
        assert bt.elapsed >= 0.0
        out = capsys.readouterr().out
        assert "unit-test-fn" in out and "unit-test-block" in out
    finally:
        set_verbosity(1)  # don't leak debug verbosity into later tests


def test_profile_writes_stats(tmp_path, capsys):
    from pseudo_3d_interpolation_tpu.utils.timing import profile

    @profile(path=str(tmp_path / "prof.txt"), n_top=5)
    def work():
        return sum(i * i for i in range(1000))

    assert work() == sum(i * i for i in range(1000))
    # with a path the decorator dumps binary cProfile stats
    import pstats

    assert (tmp_path / "prof.txt").exists()
    st = pstats.Stats(str(tmp_path / "prof.txt"))
    assert st.total_calls > 0


def test_compcache_cpu_forced_default_noop(monkeypatch, tmp_path):
    """A CPU-forced process (JAX_PLATFORMS=cpu) with no explicit cache
    request must NOT enable the default cache: XLA:CPU AOT entries bake in
    the compiling host's CPU features, so a shared default dir risks SIGILL
    when the loading host differs (the driver's virtual-mesh dryrun runs
    exactly this configuration). Explicit path/env still opt in."""
    import pseudo_3d_interpolation_tpu.utils.compcache as cc

    monkeypatch.setattr(cc, "_active_dir", None)
    monkeypatch.delenv("P3D_COMPILATION_CACHE", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert cc.enable_persistent_cache() == ""
    # explicit opt-ins still work under CPU
    import jax

    prev = jax.config.jax_compilation_cache_dir
    prev_min_t = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_min_b = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        path = str(tmp_path / "cpu-cache")
        assert cc.enable_persistent_cache(path) == path
        monkeypatch.setattr(cc, "_active_dir", None)
        path2 = str(tmp_path / "cpu-cache-env")
        monkeypatch.setenv("P3D_COMPILATION_CACHE", path2)
        assert cc.enable_persistent_cache() == path2
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min_t)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          prev_min_b)


def test_compcache_idempotent_and_disable(monkeypatch, tmp_path):
    import jax

    import pseudo_3d_interpolation_tpu.utils.compcache as cc

    # restore ALL process-global cache config afterwards (later tests
    # compile), and do it exception-safely — a mid-test assert failure must
    # not leave jax pointed at the tmp dir for the rest of the session
    prev = jax.config.jax_compilation_cache_dir
    prev_min_t = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_min_b = jax.config.jax_persistent_cache_min_entry_size_bytes
    prev_active = cc._active_dir
    try:
        monkeypatch.setattr(cc, "_active_dir", None)
        monkeypatch.setenv("P3D_COMPILATION_CACHE", "off")
        assert cc.enable_persistent_cache() == ""
        monkeypatch.delenv("P3D_COMPILATION_CACHE")
        path = str(tmp_path / "cache")
        assert cc.enable_persistent_cache(path) == path
        assert os.path.isdir(path)
        # idempotent for the SAME dir: second call returns without
        # reconfiguring; a DIFFERENT dir takes effect (per-dir latch)
        assert cc.enable_persistent_cache(path) == path
        path2 = str(tmp_path / "cache2")
        assert cc.enable_persistent_cache(path2) == path2
        assert jax.config.jax_compilation_cache_dir == path2
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min_t)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          prev_min_b)
        cc._active_dir = prev_active


def test_redirect_stdout_body_exception_survives_missing_log(tmp_path):
    """If the log file vanishes mid-run, the cleanup in the outer finally
    must not raise its own FileNotFoundError over the body's exception."""
    import os

    from pseudo_3d_interpolation_tpu.utils.logging import (
        redirect_stdout_to_file)

    p = tmp_path / "run.log"
    with pytest.raises(RuntimeError, match="boom"):
        with redirect_stdout_to_file(str(p)):
            print("hello")
            os.remove(p)
            raise RuntimeError("boom")
