"""Multi-chip sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4:
backend-parity model — same seed, numerics equivalent within fp tolerance).
"""

import numpy as np
import pytest

import jax

import rcppml_tpu as rt
from rcppml_tpu.parallel.mesh import default_mesh, fit_sharded
from rcppml_tpu.utils.simulate import simulate_nmf


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_default_mesh_shape():
    mesh = default_mesh()
    assert mesh.devices.size == 8
    assert set(mesh.axis_names) == {"rows", "cols"}


def test_sharded_fit_matches_single_chip():
    sim = simulate_nmf(m=64, n=96, k=3, noise=0.02, seed=9)
    A = sim["A"]
    cfg = rt.build_config(3, seed=11, maxit=15, tol=0.0, sort_model=False)

    from rcppml_tpu.models.nmf import nmf_fit
    res_single = nmf_fit(A, cfg)
    res_shard = fit_sharded(A, cfg, default_mesh())

    # same program, different layout: results equal to fp tolerance.
    # The Gram-trick loss is a difference of O(tr(A'A)) fp32 terms, so its
    # noise floor is ~tr(A'A)*eps under different reduction orders.
    tr = float((A * A).sum())
    assert abs(res_shard.train_loss - res_single.train_loss) < 1e-6 * tr
    np.testing.assert_allclose(res_shard.W, res_single.W, rtol=2e-3,
                               atol=2e-4)


def test_sharded_mesh_shapes():
    sim = simulate_nmf(m=40, n=64, k=2, noise=0.02, seed=4)
    cfg = rt.build_config(2, seed=5, maxit=3, tol=0.0)
    for shape in [(1, 8), (2, 4), (4, 2), (8, 1)]:
        mesh = default_mesh(shape=shape)
        res = fit_sharded(sim["A"], cfg, mesh)
        assert np.isfinite(res.train_loss)


def test_graft_entry():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out[3]))

    mod.dryrun_multichip(8)


def test_sharded_irls_fit():
    """IRLS fit runs under sharded inputs (GSPMD handles the blocked
    per-column solves across the mesh)."""
    from rcppml_tpu.parallel.mesh import default_mesh, fit_sharded
    from rcppml_tpu.utils.simulate import simulate_counts
    counts = simulate_counts(m=32, n=48, k=2, seed=4)
    cfg = rt.build_config(2, loss="gp", dispersion="none", seed=3, maxit=3,
                          tol=0.0, solver="cd", sort_model=False)
    res = fit_sharded(counts["A"], cfg, default_mesh(shape=(2, 4)))
    assert np.isfinite(res.train_loss)
    assert (res.W >= 0).all()


def test_api_mesh_kwarg():
    from rcppml_tpu.parallel.mesh import default_mesh
    from rcppml_tpu.utils.simulate import simulate_nmf
    sim = simulate_nmf(m=32, n=48, k=2, noise=0.02, seed=8)
    res = rt.nmf(sim["A"], 2, seed=5, maxit=5, tol=0.0, sort_model=False,
                 mesh=default_mesh(shape=(2, 4)))
    assert np.isfinite(res.train_loss)
    assert "config" in res.misc
