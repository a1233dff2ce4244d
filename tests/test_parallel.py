"""Multi-chip sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4:
backend-parity model — same seed, numerics equivalent within fp tolerance).
"""

import os
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


def test_sharded_cv_matches_single_chip():
    """Speckled-CV fit under a mesh equals the single-device CV fit: the
    holdout mask is derived in-jit from the traced hash, so each shard
    computes its local mask bit-identically."""
    from rcppml_tpu.models.nmf_cv import fit_cv_or_masked
    from rcppml_tpu.utils.simulate import simulate_nmf
    sim = simulate_nmf(m=48, n=64, k=3, noise=0.05, seed=21)
    cfg = rt.build_config(3, seed=7, maxit=10, tol=0.0, test_fraction=0.15,
                          cv_seed=5, sort_model=False)
    single = fit_cv_or_masked(sim["A"], cfg)
    shard = fit_cv_or_masked(sim["A"], cfg, mesh=default_mesh(shape=(2, 4)))
    assert np.isfinite(shard.test_loss)
    np.testing.assert_allclose(shard.test_loss, single.test_loss, rtol=2e-3)
    np.testing.assert_allclose(shard.W, single.W, rtol=2e-3, atol=2e-4)


def test_api_mesh_cv_dispatch():
    """nmf(..., mesh=, test_fraction=) routes through the CV path (it used
    to silently drop the holdout)."""
    from rcppml_tpu.utils.simulate import simulate_nmf
    sim = simulate_nmf(m=32, n=48, k=2, noise=0.05, seed=9)
    res = rt.nmf(sim["A"], 2, seed=5, maxit=6, tol=0.0, test_fraction=0.2,
                 cv_seed=3, sort_model=False, mesh=default_mesh(shape=(2, 4)))
    assert np.isfinite(res.test_loss)
    assert len(res.test_loss_history) == res.iterations


def test_sharded_masked_fit():
    """User-supplied mask under a mesh."""
    from rcppml_tpu.models.nmf_cv import fit_cv_or_masked
    from rcppml_tpu.utils.simulate import simulate_nmf
    rs = np.random.RandomState(3)
    sim = simulate_nmf(m=32, n=40, k=2, noise=0.05, seed=10)
    mask = rs.uniform(size=sim["A"].shape) < 0.1   # True = held out
    cfg = rt.build_config(2, seed=2, maxit=5, tol=0.0, has_mask=True,
                          sort_model=False)
    single = fit_cv_or_masked(sim["A"], cfg, mask=mask)
    shard = fit_cv_or_masked(sim["A"], cfg, mask=mask,
                             mesh=default_mesh(shape=(4, 2)))
    np.testing.assert_allclose(shard.W, single.W, rtol=2e-3, atol=2e-4)


def test_sharded_nondivisible_dims():
    """Matrix dims that don't divide the mesh are zero-padded; results match
    single-chip (pads solve to exact zeros, accounting is restricted to the
    valid region)."""
    from rcppml_tpu.models.nmf import nmf_fit
    from rcppml_tpu.utils.simulate import simulate_nmf, simulate_counts
    mesh = default_mesh(shape=(2, 4))
    sim = simulate_nmf(m=81, n=97, k=3, noise=0.05, seed=5)

    cfg = rt.build_config(3, seed=7, maxit=8, tol=0.0, sort_model=False)
    s = nmf_fit(sim["A"], cfg)
    p = fit_sharded(sim["A"], cfg, mesh)
    assert p.W.shape == (81, 3) and p.H.shape == (3, 97)
    np.testing.assert_allclose(p.W, s.W, rtol=2e-3, atol=2e-4)
    tr = float((sim["A"] ** 2).sum())
    assert abs(p.train_loss - s.train_loss) < 1e-6 * tr

    # CV on non-divisible dims: holdout accounting excludes pads exactly
    kw = dict(seed=2, maxit=8, tol=0.0, test_fraction=0.2, cv_seed=1,
              sort_model=False)
    sc = rt.nmf(sim["A"], 3, **kw)
    pc = rt.nmf(sim["A"], 3, mesh=mesh, **kw)
    np.testing.assert_allclose(pc.test_loss, sc.test_loss, rtol=1e-4)

    # IRLS explicit-NLL accounting restricted to the valid region
    counts = simulate_counts(m=33, n=49, k=2, seed=4)
    cfgk = rt.build_config(2, loss="gp", dispersion="none", seed=3, maxit=4,
                           tol=0.0, solver="cd", sort_model=False)
    sk = nmf_fit(counts["A"], cfgk)
    pk = fit_sharded(counts["A"], cfgk, mesh)
    np.testing.assert_allclose(pk.train_loss, sk.train_loss, rtol=1e-5)

    # per-row NB theta sliced to true length
    cfgn = rt.build_config(2, loss="nb", dispersion="per_row", seed=3,
                           maxit=3, tol=0.0, solver="cd", sort_model=False)
    pn = fit_sharded(counts["A"], cfgn, mesh)
    assert pn.theta.shape == (33,) and np.isfinite(pn.theta).all()


def test_multihost_single_process():
    """multihost.initialize() is a safe no-op in single-process mode and
    reports the runtime topology; shard_host_data builds a global sharded
    array from (the only) process-local block."""
    from rcppml_tpu.parallel import multihost
    info = multihost.initialize()
    assert info["process_count"] == 1
    assert info["global_devices"] >= 8
    mesh = default_mesh(shape=(2, 4))
    A = np.arange(64 * 96, dtype=np.float32).reshape(64, 96)
    arr = multihost.shard_host_data(A, mesh)
    assert arr.shape == (64, 96)
    np.testing.assert_array_equal(np.asarray(arr), A)


def test_fit_sharded_device_input():
    """A pre-sharded device array passes through fit_sharded without a
    host gather (the multi-host data path)."""
    from rcppml_tpu.parallel import multihost
    from rcppml_tpu.utils.simulate import simulate_nmf
    mesh = default_mesh(shape=(2, 4))
    sim = simulate_nmf(m=64, n=96, k=3, noise=0.02, seed=9)
    A_dev = multihost.shard_host_data(sim["A"], mesh)
    cfg = rt.build_config(3, seed=11, maxit=10, tol=0.0, sort_model=False)
    res_dev = fit_sharded(A_dev, cfg, mesh)
    res_host = fit_sharded(sim["A"], cfg, mesh)
    np.testing.assert_allclose(res_dev.W, res_host.W, rtol=1e-5, atol=1e-6)
    # non-divisible device input gives a clear error instead of silence
    sim2 = simulate_nmf(m=63, n=96, k=3, noise=0.02, seed=9)
    A2 = jax.device_put(sim2["A"])
    with pytest.raises(ValueError, match="does not divide"):
        fit_sharded(A2, cfg, mesh)


def test_two_process_distributed_fit(tmp_path):
    """REAL multi-process seam: two OS processes join via jax.distributed,
    each contributes only its local column slice through
    multihost.shard_host_data (the global array is not fully addressable),
    and the sharded fit matches a single-process reference."""
    import socket
    import subprocess
    import sys

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    out = str(tmp_path / "mp.npz")
    worker = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)       # workers force cpu themselves
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), str(port), out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    logs = []
    for p in procs:
        try:
            log, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            log, _ = p.communicate()
        logs.append(log)
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    z = np.load(out)
    rs = np.random.RandomState(0)
    A = np.abs(rs.rand(24, 32)).astype(np.float32)
    import rcppml_tpu as rt
    ref = rt.nmf(A, 4, seed=42, maxit=20, tol=0.0, sort_model=False)
    assert int(z["iterations"]) == ref.iterations
    np.testing.assert_allclose(z["W"], ref.W, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(z["H"], ref.H, rtol=1e-4, atol=1e-5)


def test_device_health_check():
    from rcppml_tpu.parallel.mesh import check_device_health, default_mesh
    devs = check_device_health()
    assert len(devs) == len(jax.devices())
    m = default_mesh(health_check=True)
    assert m.devices.size == len(jax.devices())
