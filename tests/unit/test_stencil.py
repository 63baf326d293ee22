"""Matrix-free stencil applies vs assembled matrices (exactness) and a full
matrix-free eigensolve (SURVEY.md §2 C2 assembly-free path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from maxwell_tpu.problems import RectCavity2D
from maxwell_tpu.problems.stencil2d import StencilPencil2D
from maxwell_tpu.solvers import lobpcg
from maxwell_tpu.solvers.precond import shifted_cg_preconditioner

NX, NY = 12, 10


@pytest.fixture(scope="module")
def pair():
    cav = RectCavity2D(a=1.0, b=1.3, nx=NX, ny=NY)
    stp = StencilPencil2D.build(a=1.0, b=1.3, nx=NX, ny=NY, dtype=jnp.float64)
    # map assembled (kept, cavity numbering) -> stencil (full, grid-major)
    n_xe = NX * (NY + 1)

    def cav_edge_to_stencil(e):
        if e < n_xe:  # cavity: id = j*NX + i ; stencil: i*(NY+1) + j
            i, j = e % NX, e // NX
            return i * (NY + 1) + j
        e -= n_xe
        i, j = e % (NX + 1), e // (NX + 1)  # cavity y: id = j*(NX+1)+i
        return n_xe + i * NY + j  # stencil y: i*NY + j

    idx = np.array([cav_edge_to_stencil(e) for e in cav.keep])
    return cav, stp, idx


def test_stencil_K_matches_assembled(pair):
    cav, stp, idx = pair
    rng = np.random.default_rng(0)
    Xk = rng.standard_normal((cav.n_edges, 3))
    Xf = np.zeros((stp.n_padded, 3))
    Xf[idx] = Xk
    Y = np.asarray(stp.K_mm(jnp.asarray(Xf)))
    Y_ref = cav.K @ Xk
    np.testing.assert_allclose(Y[idx], Y_ref, rtol=1e-12, atol=1e-12)
    # masked (PEC) edges stay zero
    other = np.setdiff1d(np.arange(stp.n_padded), idx)
    assert np.abs(Y[other]).max() < 1e-14


def test_stencil_M_matches_assembled(pair):
    cav, stp, idx = pair
    rng = np.random.default_rng(1)
    Xk = rng.standard_normal((cav.n_edges, 2))
    Xf = np.zeros((stp.n_padded, 2))
    Xf[idx] = Xk
    Y = np.asarray(stp.M_mm(jnp.asarray(Xf)))
    np.testing.assert_allclose(Y[idx], cav.M @ Xk, rtol=1e-12, atol=1e-12)


def test_matrix_free_lobpcg(pair):
    cav, stp, idx = pair
    dense = scipy.linalg.eigh(
        cav.K.toarray(), cav.M.toarray(), eigvals_only=True
    )
    discrete = np.sort(dense[dense > 1e-8])[:4]
    pc = shifted_cg_preconditioner(stp, alpha=10.0, iters=20)
    res = lobpcg(stp, nev=4, maxiter=100, tol=1e-9, precond=pc)
    assert res.converged, f"residuals {res.residuals}"
    np.testing.assert_allclose(res.eigenvalues, discrete, rtol=1e-7)


# ---------------------------------------------------------------------------
# 3D
# ---------------------------------------------------------------------------
from maxwell_tpu.problems import BrickCavity3D
from maxwell_tpu.problems.stencil3d import StencilPencil3D

N3 = 5


@pytest.fixture(scope="module")
def pair3d():
    cav = BrickCavity3D(a=1.0, b=1.2, c=0.9, nx=N3, ny=4, nz=3)
    stp = StencilPencil3D.build(
        a=1.0, b=1.2, c=0.9, nx=N3, ny=4, nz=3, dtype=jnp.float64
    )
    nx, ny, nz = N3, 4, 3
    n_xe = nx * (ny + 1) * (nz + 1)
    n_ye = (nx + 1) * ny * (nz + 1)

    def cav_edge_to_stencil(e):
        # cavity numbering (cavity3d.py): xe=(k*(ny+1)+j)*nx+i etc.
        if e < n_xe:
            i = e % nx
            j = (e // nx) % (ny + 1)
            k = e // (nx * (ny + 1))
            return (i * (ny + 1) + j) * (nz + 1) + k
        e2 = e - n_xe
        if e2 < n_ye:
            i = e2 % (nx + 1)
            j = (e2 // (nx + 1)) % ny
            k = e2 // ((nx + 1) * ny)
            return n_xe + (i * ny + j) * (nz + 1) + k
        e3 = e2 - n_ye
        i = e3 % (nx + 1)
        j = (e3 // (nx + 1)) % (ny + 1)
        k = e3 // ((nx + 1) * (ny + 1))
        return n_xe + n_ye + (i * (ny + 1) + j) * nz + k

    idx = np.array([cav_edge_to_stencil(e) for e in cav.keep])
    return cav, stp, idx


def test_stencil3d_K_matches_assembled(pair3d):
    cav, stp, idx = pair3d
    rng = np.random.default_rng(3)
    Xk = rng.standard_normal((cav.n_edges, 2))
    Xf = np.zeros((stp.n_padded, 2))
    Xf[idx] = Xk
    Y = np.asarray(stp.K_mm(jnp.asarray(Xf)))
    np.testing.assert_allclose(Y[idx], cav.K @ Xk, rtol=1e-12, atol=1e-12)
    other = np.setdiff1d(np.arange(stp.n_padded), idx)
    assert np.abs(Y[other]).max() < 1e-14


def test_stencil3d_M_matches_assembled(pair3d):
    cav, stp, idx = pair3d
    rng = np.random.default_rng(4)
    Xk = rng.standard_normal((cav.n_edges, 2))
    Xf = np.zeros((stp.n_padded, 2))
    Xf[idx] = Xk
    Y = np.asarray(stp.M_mm(jnp.asarray(Xf)))
    np.testing.assert_allclose(Y[idx], cav.M @ Xk, rtol=1e-12, atol=1e-12)


def test_stencil3d_lobpcg(pair3d):
    cav, stp, idx = pair3d
    dense = scipy.linalg.eigh(
        cav.K.toarray(), cav.M.toarray(), eigvals_only=True
    )
    discrete = np.sort(dense[dense > 1e-8])[:3]
    pc = shifted_cg_preconditioner(stp, alpha=15.0, iters=20)
    res = lobpcg(stp, nev=3, maxiter=100, tol=1e-9, precond=pc)
    assert res.converged, f"residuals {res.residuals}"
    np.testing.assert_allclose(res.eigenvalues, discrete, rtol=1e-7)


def test_stencil3d_materials_match_assembled():
    """Per-cell eps_r/mu_r: stencil apply == assembled matrices."""
    rng = np.random.default_rng(11)
    nx, ny, nz = 4, 3, 3
    eps_r = 1.0 + rng.random((nx, ny, nz))
    mu_r = 1.0 + rng.random((nx, ny, nz))
    cav = BrickCavity3D(nx=nx, ny=ny, nz=nz, eps_r=eps_r, mu_r=mu_r)
    stp = StencilPencil3D.build(
        nx=nx, ny=ny, nz=nz, dtype=jnp.float64, eps_r=eps_r, mu_r=mu_r
    )
    n_xe = nx * (ny + 1) * (nz + 1)
    n_ye = (nx + 1) * ny * (nz + 1)

    def conv(e):
        if e < n_xe:
            i = e % nx
            j = (e // nx) % (ny + 1)
            k = e // (nx * (ny + 1))
            return (i * (ny + 1) + j) * (nz + 1) + k
        e2 = e - n_xe
        if e2 < n_ye:
            i = e2 % (nx + 1)
            j = (e2 // (nx + 1)) % ny
            k = e2 // ((nx + 1) * ny)
            return n_xe + (i * ny + j) * (nz + 1) + k
        e3 = e2 - n_ye
        i = e3 % (nx + 1)
        j = (e3 // (nx + 1)) % (ny + 1)
        k = e3 // ((nx + 1) * (ny + 1))
        return n_xe + n_ye + (i * (ny + 1) + j) * nz + k

    idx = np.array([conv(e) for e in cav.keep])
    Xk = rng.standard_normal((cav.n_edges, 2))
    Xf = np.zeros((stp.n_padded, 2))
    Xf[idx] = Xk
    YK = np.asarray(stp.K_mm(jnp.asarray(Xf)))
    YM = np.asarray(stp.M_mm(jnp.asarray(Xf)))
    np.testing.assert_allclose(YK[idx], cav.K @ Xk, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(YM[idx], cav.M @ Xk, rtol=1e-12, atol=1e-12)
    # fused path consistent too
    K2, M2 = stp.KM_mm(jnp.asarray(Xf))
    np.testing.assert_allclose(np.asarray(K2), YK, atol=1e-13)
    np.testing.assert_allclose(np.asarray(M2), YM, atol=1e-13)


def test_materials_eigensolve():
    """Dielectric-loaded cavity: LOBPCG on material matrices vs dense oracle;
    eigenvalues shift DOWN versus vacuum (higher eps)."""
    nx, ny, nz = 5, 4, 4
    eps_r = np.ones((nx, ny, nz))
    eps_r[: nx // 2] = 4.0  # half-filled dielectric
    cav = BrickCavity3D(nx=nx, ny=ny, nz=nz, eps_r=eps_r)
    from maxwell_tpu.solvers import Pencil, lobpcg

    pencil = Pencil.from_problem(cav, block=8, dtype=jnp.float64)
    dense = scipy.linalg.eigh(
        cav.K.toarray(), cav.M.toarray(), eigvals_only=True
    )
    discrete = np.sort(dense[dense > 1e-8])[:3]
    pc = shifted_cg_preconditioner(pencil, alpha=float(discrete[0]), iters=20)
    res = lobpcg(pencil, nev=3, maxiter=120, tol=1e-8, precond=pc)
    assert res.converged
    np.testing.assert_allclose(res.eigenvalues, discrete, rtol=1e-7)
    vacuum = BrickCavity3D(nx=nx, ny=ny, nz=nz).analytic_eigenvalues(1)[0]
    assert res.eigenvalues[0] < vacuum  # dielectric pulls modes down


def test_stencil2d_materials_match_assembled():
    rng = np.random.default_rng(13)
    nx, ny = 6, 5
    eps_r = 1.0 + rng.random((nx, ny))
    mu_r = 1.0 + rng.random((nx, ny))
    cav = RectCavity2D(nx=nx, ny=ny, eps_r=eps_r, mu_r=mu_r)
    stp = StencilPencil2D.build(
        nx=nx, ny=ny, dtype=jnp.float64, eps_r=eps_r, mu_r=mu_r
    )
    n_xe = nx * (ny + 1)

    def conv(e):
        if e < n_xe:
            i, j = e % nx, e // nx
            return i * (ny + 1) + j
        e -= n_xe
        i, j = e % (nx + 1), e // (nx + 1)
        return n_xe + i * ny + j

    idx = np.array([conv(e) for e in cav.keep])
    Xk = rng.standard_normal((cav.n_edges, 2))
    Xf = np.zeros((stp.n_padded, 2))
    Xf[idx] = Xk
    np.testing.assert_allclose(
        np.asarray(stp.K_mm(jnp.asarray(Xf)))[idx], cav.K @ Xk,
        rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(stp.M_mm(jnp.asarray(Xf)))[idx], cav.M @ Xk,
        rtol=1e-12, atol=1e-12,
    )


def test_stencil_pmc_matches_assembled_spectrum():
    """PMC stencil pencil reproduces the assembled PMC spectrum exactly."""
    cav = RectCavity2D(nx=12, ny=10, a=1.0, b=0.8, bc="pmc")
    stp = StencilPencil2D.build(
        nx=12, ny=10, a=1.0, b=0.8, dtype=jnp.float64, bc="pmc"
    )
    dense = scipy.linalg.eigh(
        cav.K.toarray(), cav.M.toarray(), eigvals_only=True
    )
    discrete = np.sort(dense[dense > 1e-8])[:3]
    pc = shifted_cg_preconditioner(stp, alpha=float(discrete[0]), iters=20)
    res = lobpcg(stp, nev=3, maxiter=150, tol=1e-9, precond=pc)
    assert res.converged
    np.testing.assert_allclose(res.eigenvalues, discrete, rtol=1e-7)


def test_stencil3d_taps_vs_panel_paths():
    """The translation-invariant tap fast path (vacuum+PEC) must reproduce
    the per-cell panel apply exactly: matvec, matmat, and the fused KM."""
    from maxwell_tpu.problems.stencil3d import StencilPencil3D

    stp = StencilPencil3D.build(
        a=1.1, b=0.7, c=1.4, nx=5, ny=7, nz=6, dtype=jnp.float64
    )
    assert stp.taps is not None  # vacuum + PEC enables the fast path
    assert all(len(t) == 33 for t in stp.taps)  # assembled row nnz
    rng = np.random.default_rng(7)
    X = jnp.asarray(rng.standard_normal((stp.n_padded, 3)))
    YK, YM = stp._taps_apply(X, True, True)
    YK_ref = stp._element_apply(stp.Ke, X)
    YM_ref = stp._element_apply(stp.Me, X)
    np.testing.assert_allclose(np.asarray(YK), np.asarray(YK_ref),
                               rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(np.asarray(YM), np.asarray(YM_ref),
                               rtol=1e-13, atol=1e-13)
    # fused KM dispatch + the vector (ndim==1) case
    # tight tolerance, not bitwise: distinct compiled programs are not
    # guaranteed bit-identical across backends (advisor finding, round 1)
    YK2, YM2 = stp.KM_mm(X)
    np.testing.assert_allclose(
        np.asarray(YK2), np.asarray(YK), rtol=1e-14, atol=1e-14
    )
    v = X[:, 0]
    np.testing.assert_allclose(
        np.asarray(stp.K_mm(v)), np.asarray(YK)[:, 0], rtol=1e-14, atol=1e-14
    )
    # materials / PMC builds must NOT take the fast path
    pmc = StencilPencil3D.build(nx=3, ny=3, nz=3, bc="pmc")
    assert pmc.taps is None
    mat = StencilPencil3D.build(
        nx=3, ny=3, nz=3, eps_r=np.ones((3, 3, 3))
    )
    assert mat.taps is None


def test_stencil3d_taps_vs_panel_f32():
    """Tap/panel agreement at the production dtype (f32): taps are derived
    from the dtype-cast element matrices (advisor finding, round 1)."""
    from maxwell_tpu.problems.stencil3d import StencilPencil3D

    stp = StencilPencil3D.build(
        a=1.1, b=0.7, c=1.4, nx=4, ny=5, nz=3, dtype=jnp.float32
    )
    assert stp.taps is not None
    rng = np.random.default_rng(11)
    X = jnp.asarray(
        rng.standard_normal((stp.n_padded, 2)).astype(np.float32)
    )
    YK, YM = stp._taps_apply(X, True, True)
    YK_ref = stp._element_apply(stp.Ke, X)
    YM_ref = stp._element_apply(stp.Me, X)
    np.testing.assert_allclose(
        np.asarray(YK), np.asarray(YK_ref), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(YM), np.asarray(YM_ref), rtol=2e-5, atol=2e-5
    )


def test_stencil3d_field_taps_materials_and_pmc():
    """Field-coefficient taps (round-1 VERDICT item 9): loaded cavities and
    PMC walls keep a gather-free fast path, exact vs the assembled
    operators (zero-padded cell scales make boundary rows exact)."""
    from maxwell_tpu.problems import BrickCavity3D
    from maxwell_tpu.problems.stencil3d import StencilPencil3D

    nx, ny, nz = 4, 3, 5
    rng = np.random.default_rng(2)
    eps_r = 1.0 + rng.random((nx, ny, nz))
    mu_r = 1.0 + rng.random((nx, ny, nz))

    for bc in ("pec", "pmc"):
        stp = StencilPencil3D.build(
            a=1.1, b=0.9, c=1.3, nx=nx, ny=ny, nz=nz,
            dtype=jnp.float64, eps_r=eps_r, mu_r=mu_r, bc=bc,
        )
        assert stp.taps is None and stp.ftaps_meta is not None
        X = jnp.asarray(rng.standard_normal((stp.n_padded, 2)))
        YK = stp.K_mm(X)
        YM = stp.M_mm(X)
        YK_ref = stp._element_apply(stp.Ke, X, scale=stp.inv_mu)
        YM_ref = stp._element_apply(stp.Me, X, scale=stp.eps)
        np.testing.assert_allclose(
            np.asarray(YK), np.asarray(YK_ref), rtol=1e-12, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(YM), np.asarray(YM_ref), rtol=1e-12, atol=1e-12
        )
        # fused + vector dispatches
        YK2, YM2 = stp.KM_mm(X)
        np.testing.assert_allclose(
            np.asarray(YK2), np.asarray(YK), rtol=1e-14, atol=1e-14
        )
        v = stp.K_mm(X[:, 0])
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(YK)[:, 0], rtol=1e-14, atol=1e-14
        )


def test_stencil3d_field_taps_pmc_vacuum_spectrum():
    """Vacuum PMC via field taps reproduces the assembled PMC spectrum."""
    import scipy.linalg

    from maxwell_tpu.problems import BrickCavity3D
    from maxwell_tpu.problems.stencil3d import StencilPencil3D
    from maxwell_tpu.solvers import lobpcg
    from maxwell_tpu.solvers.precond import shifted_cg_preconditioner

    nx = ny = nz = 4
    stp = StencilPencil3D.build(
        nx=nx, ny=ny, nz=nz, dtype=jnp.float64, bc="pmc"
    )
    assert stp.ftaps_meta is not None
    cav = BrickCavity3D(nx=nx, ny=ny, nz=nz, bc="pmc")
    dense = scipy.linalg.eigh(
        cav.K.toarray(), cav.M.toarray(), eigvals_only=True
    )
    discrete = np.sort(dense[dense > 1e-8])
    pc = shifted_cg_preconditioner(stp, alpha=15.0, iters=12)
    res = lobpcg(stp, nev=3, maxiter=200, tol=1e-9, precond=pc)
    assert res.converged
    np.testing.assert_allclose(res.eigenvalues, discrete[:3], rtol=1e-7)
