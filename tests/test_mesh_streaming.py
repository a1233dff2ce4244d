"""Sharded streaming ingest + checkpoint x mesh (round-3 work).

Streaming and the mesh compose (SURVEY §5 "chunk ingest -> per-host
sharded loading", parity gate #5): panels are device_put with the
canonical shardings and results match the single-device stream to fp32
tolerance.  The segmented fused checkpointing covers sharded fits (the
pod-scale case SURVEY.md:487 names) with bitwise resume.
"""

import os

import numpy as np
import pytest

import jax

import rcppml_tpu as rt
from rcppml_tpu.io.loaders import InMemoryLoader
from rcppml_tpu.models.nmf_chunked import nmf_chunked
from rcppml_tpu.parallel.mesh import default_mesh, fit_sharded


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    return default_mesh(jax.devices())


@pytest.fixture(scope="module")
def A():
    rs = np.random.RandomState(0)
    return rs.rand(67, 93).astype(np.float32)   # non-divisible dims


def test_streaming_mesh_matches_single_device(mesh, A):
    cfg = rt.build_config(5, seed=42, maxit=8, tol=0.0, sort_model=False)
    r1 = nmf_chunked(InMemoryLoader(A, chunk_cols=40), cfg)
    r2 = nmf_chunked(InMemoryLoader(A, chunk_cols=40), cfg, mesh=mesh)
    assert np.allclose(r1.W, r2.W, atol=1e-4)
    assert np.allclose(r1.H, r2.H, atol=1e-4)
    assert abs(r1.train_loss - r2.train_loss) < 1e-3 * abs(r1.train_loss)


def test_streaming_mesh_cv(mesh, A):
    cfg = rt.build_config(4, seed=42, maxit=6, tol=0.0, test_fraction=0.2,
                          cv_seed=7, sort_model=False)
    r1 = nmf_chunked(InMemoryLoader(A, chunk_cols=40), cfg)
    r2 = nmf_chunked(InMemoryLoader(A, chunk_cols=40), cfg, mesh=mesh)
    assert abs(r1.test_loss - r2.test_loss) < 1e-4
    assert abs(r1.train_loss - r2.train_loss) < 1e-4


def test_streaming_mesh_zi_nb(mesh):
    rs = np.random.RandomState(1)
    cnt = rs.poisson(1.5, size=(67, 93)).astype(np.float32)
    cfg = rt.build_config(3, seed=1, maxit=4, tol=0.0, loss="nb", zi="row",
                          dispersion="per_row", sort_model=False)
    r1 = nmf_chunked(InMemoryLoader(cnt, chunk_cols=40), cfg)
    r2 = nmf_chunked(InMemoryLoader(cnt, chunk_cols=40), cfg, mesh=mesh)
    # pads must not leak into the ZI dropout statistics
    assert np.allclose(np.asarray(r1.pi_row), np.asarray(r2.pi_row),
                       atol=1e-4)
    assert abs(r1.train_loss - r2.train_loss) < 1e-2


def test_streaming_mesh_spz_matches_in_memory_sharded(mesh, tmp_path):
    import scipy.sparse as sp
    from rcppml_tpu.io.spz import st_write
    rs = np.random.RandomState(2)
    A = (rs.rand(67, 93) * (rs.rand(67, 93) < 0.3)).astype(np.float32)
    path = str(tmp_path / "a.spz")
    st_write(sp.csc_matrix(A), path, chunk_cols=40)
    kw = dict(seed=42, maxit=8, tol=0.0, sort_model=False)
    r_spz = rt.nmf(path, 5, mesh=mesh, **kw)
    r_mem = fit_sharded(A, rt.build_config(5, **kw), mesh)
    assert np.allclose(r_spz.W, r_mem.W, atol=1e-4)
    assert abs(r_spz.train_loss - r_mem.train_loss) \
        < 1e-3 * abs(r_mem.train_loss)


def test_streaming_on_iteration_callback(A):
    calls = []
    rt.nmf(A, 4, streaming=True, chunk_cols=40, seed=42, maxit=5, tol=0.0,
           on_iteration=lambda it, tr, te: calls.append((it, tr, te)))
    assert [c[0] for c in calls] == [1, 2, 3, 4, 5]
    assert all(np.isfinite(c[1]) for c in calls)


def test_streaming_checkpoint_resume_bitwise(A, tmp_path):
    ck = str(tmp_path / "stream.npz")
    full = rt.nmf(A, 4, streaming=True, chunk_cols=40, seed=42, maxit=10,
                  tol=0.0)
    rt.nmf(A, 4, streaming=True, chunk_cols=40, seed=42, maxit=4, tol=0.0,
           checkpoint_path=ck, checkpoint_every=2)
    assert os.path.exists(ck)
    resumed = rt.nmf(A, 4, streaming=True, chunk_cols=40, seed=42,
                     maxit=10, tol=0.0, checkpoint_path=ck)
    assert np.array_equal(full.W, resumed.W)
    assert np.array_equal(full.H, resumed.H)
    assert full.train_loss == resumed.train_loss
    assert full.iterations == resumed.iterations


def test_streaming_checkpoint_resume_zi(tmp_path):
    rs = np.random.RandomState(4)
    cnt = rs.poisson(1.5, size=(50, 70)).astype(np.float32)
    ck = str(tmp_path / "zi.npz")
    kw = dict(streaming=True, chunk_cols=30, seed=1, tol=0.0, loss="nb",
              zi="row", dispersion="per_row")
    full = rt.nmf(cnt, 3, maxit=6, **kw)
    rt.nmf(cnt, 3, maxit=3, checkpoint_path=ck, **kw)
    resumed = rt.nmf(cnt, 3, maxit=6, checkpoint_path=ck, **kw)
    assert np.array_equal(full.W, resumed.W)
    assert np.array_equal(np.asarray(full.pi_row),
                          np.asarray(resumed.pi_row))


def test_streaming_checkpoint_config_mismatch(A, tmp_path):
    ck = str(tmp_path / "cfg.npz")
    rt.nmf(A, 4, streaming=True, chunk_cols=40, seed=42, maxit=2, tol=0.0,
           checkpoint_path=ck)
    with pytest.raises(ValueError, match="config mismatch"):
        rt.nmf(A, 4, streaming=True, chunk_cols=40, seed=43, maxit=4,
               tol=0.0, checkpoint_path=ck)


def test_checkpoint_mesh_bitwise_resume(mesh, tmp_path):
    rs = np.random.RandomState(3)
    A = rs.rand(61, 85).astype(np.float32)   # padding exercised
    kw = dict(seed=42, maxit=12, tol=0.0, sort_model=False)
    ck = str(tmp_path / "m.npz")
    ref = fit_sharded(A, rt.build_config(4, **kw), mesh)
    rt.nmf(A, 4, mesh=mesh, checkpoint_path=ck, checkpoint_every=5,
           **{**kw, "maxit": 5})
    resumed = rt.nmf(A, 4, mesh=mesh, checkpoint_path=ck,
                     checkpoint_every=5, **kw)
    assert np.array_equal(ref.W, resumed.W)
    assert np.array_equal(ref.H, resumed.H)
    assert ref.train_loss == resumed.train_loss


def test_checkpoint_mesh_shape_mismatch_rejected(mesh, tmp_path):
    rs = np.random.RandomState(3)
    A = rs.rand(61, 85).astype(np.float32)
    kw = dict(seed=42, maxit=4, tol=0.0, sort_model=False)
    ck = str(tmp_path / "m.npz")
    rt.nmf(A, 4, mesh=mesh, checkpoint_path=ck, **kw)
    with pytest.raises(ValueError, match="mesh"):
        rt.nmf(A, 4, checkpoint_path=ck, **{**kw, "maxit": 8})


def test_checkpoint_mesh_irls_zi(mesh, tmp_path):
    rs = np.random.RandomState(5)
    cnt = rs.poisson(1.5, size=(61, 85)).astype(np.float32)
    kw = dict(seed=1, tol=0.0, loss="nb", zi="row", dispersion="per_row",
              sort_model=False)
    ck = str(tmp_path / "z.npz")
    ref = fit_sharded(cnt, rt.build_config(3, maxit=6, **kw), mesh)
    rt.nmf(cnt, 3, mesh=mesh, checkpoint_path=ck, checkpoint_every=3,
           maxit=3, **kw)
    resumed = rt.nmf(cnt, 3, mesh=mesh, checkpoint_path=ck,
                     checkpoint_every=3, maxit=6, **kw)
    assert np.array_equal(ref.W, resumed.W)
    assert np.array_equal(np.asarray(ref.pi_row),
                          np.asarray(resumed.pi_row))


def test_semi_nmf_l1_padding_guard(mesh):
    """Mesh zero-padding is unsound for semi-NMF + L1: must raise, not
    silently return wrong numbers (round-2 review Weak #2)."""
    rs = np.random.RandomState(6)
    A = rs.rand(61, 85).astype(np.float32)   # does not divide 2x4
    cfg = rt.build_config(4, seed=1, maxit=3, nonneg=False, L1=0.1,
                          solver="cd")
    with pytest.raises(ValueError, match="semi-NMF"):
        fit_sharded(A, cfg, mesh)
    # divisible shapes stay allowed
    A_ok = rs.rand(64, 88).astype(np.float32)
    res = fit_sharded(A_ok, cfg, mesh)
    assert np.isfinite(res.train_loss)
