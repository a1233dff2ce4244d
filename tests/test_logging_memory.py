"""Leveled logging (core/logging.hpp) + memory guard (core/memory.hpp)."""
import numpy as np
import pytest

import rcppml_tpu as rt
from rcppml_tpu.utils import logging as logmod
from rcppml_tpu.utils import memory as memmod


@pytest.fixture(autouse=True)
def _reset_verbosity():
    prev = logmod.get_verbosity()
    yield
    logmod.set_verbosity(prev)


def test_levels_are_ordered():
    L = logmod.LogLevel
    assert L.SILENT < L.SUMMARY < L.DETAILED < L.DEBUG


def test_silent_by_default(capsys):
    logmod.set_verbosity(0)
    logmod.log_summary("should not appear")
    logmod.log_debug("nor this")
    assert capsys.readouterr().out == ""


def test_level_gating(capsys):
    logmod.set_verbosity("DETAILED")
    logmod.log_summary("s")
    logmod.log_detailed("d")
    logmod.log_debug("g")
    out = capsys.readouterr().out
    assert "s" in out and "d" in out and "g" not in out


def test_per_call_verbose_raises_level(capsys):
    logmod.set_verbosity(0)
    logmod.log_summary("via-call", verbose=True)
    assert "via-call" in capsys.readouterr().out


def test_invalid_level_rejected():
    with pytest.raises(ValueError):
        logmod.set_verbosity("LOUD")


def test_nmf_verbose_summary(capsys):
    rs = np.random.RandomState(0)
    A = np.abs(rs.rand(20, 15))
    rt.nmf(A, 3, maxit=5, seed=1, verbose=True)
    out = capsys.readouterr().out
    assert "[nmf]" in out and "k=3" in out and "done:" in out


def test_nmf_detailed_replays_iterations(capsys):
    logmod.set_verbosity("DETAILED")
    rs = np.random.RandomState(0)
    A = np.abs(rs.rand(20, 15))
    res = rt.nmf(A, 3, maxit=5, seed=1, tol=0.0)
    out = capsys.readouterr().out
    assert out.count("iter") >= res.iterations - 1


def test_nmf_silent_without_verbose(capsys):
    logmod.set_verbosity(0)
    rs = np.random.RandomState(0)
    A = np.abs(rs.rand(20, 15))
    rt.nmf(A, 3, maxit=5, seed=1)
    assert capsys.readouterr().out == ""


# ---------------- memory guard ----------------

def test_format_bytes():
    assert memmod.format_bytes(512) == "512 B"
    assert memmod.format_bytes(2048) == "2.0 KB"
    assert "GB" in memmod.format_bytes(3 * 1024 ** 3)


def test_available_host_bytes_positive():
    # /proc/meminfo exists on the build hosts (platform.hpp:53-63)
    assert memmod.available_host_bytes() > 0


def test_small_alloc_fits():
    res = memmod.check_dense_alloc(100, 100)
    assert res.fits and res.headroom_fraction > memmod.SAFETY_FACTOR


def test_huge_alloc_refused_with_streaming_remedy():
    res = memmod.check_dense_alloc(10 ** 7, 10 ** 7)  # 400 TB
    assert not res.fits
    assert "spz" in res.message and "INSUFFICIENT" in res.message


def test_nmf_sparse_densification_guarded(monkeypatch):
    import scipy.sparse as sp
    monkeypatch.setattr(memmod, "available_host_bytes", lambda: 10_000)
    A = sp.random(200, 100, density=0.01, format="csc")
    with pytest.raises(MemoryError, match="spz"):
        rt.nmf(A, 3, maxit=2, seed=1)


def test_unknown_budget_passes(monkeypatch):
    monkeypatch.setattr(memmod, "available_host_bytes", lambda: 0)
    res = memmod.check_dense_alloc(10 ** 7, 10 ** 7)
    assert res.fits and "unknown" in res.message


def test_auto_streaming_beyond_hbm(monkeypatch):
    """Inputs that exceed device HBM auto-stream through the chunked
    engine instead of OOMing (gpu/loader.hpp streaming mode,
    test_gpu_oom.R:9)."""
    monkeypatch.setattr(memmod, "device_hbm_bytes", lambda: 20_000)
    A = np.abs(np.random.RandomState(0).rand(60, 50)).astype(np.float32)
    res = rt.nmf(A, 3, maxit=5, seed=1)
    # chunked result still matches shapes and is finite
    assert res.W.shape == (60, 3)
    assert np.all(np.isfinite(np.asarray(res.W)))
    # ZI cannot stream: stays in-memory rather than erroring
    cnt = np.random.RandomState(1).poisson(2, (30, 25)).astype(np.float64)
    r2 = rt.nmf(cnt, 2, maxit=3, seed=1, loss="nb", zi="row",
                dispersion="per_row")
    assert r2.pi_row is not None
