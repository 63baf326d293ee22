"""Slab-sharded matrix-free 3D pencil: parity vs the single-device stencil
and a full distributed eigensolve (SURVEY.md §2 C2+C8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg
from jax.sharding import PartitionSpec as P

from maxwell_tpu.dist import make_mesh
from maxwell_tpu.dist.stencil_dist import DistStencilPencil3D
from maxwell_tpu.problems import BrickCavity3D
from maxwell_tpu.problems.stencil3d import StencilPencil3D

D = 8
NX, NY, NZ = 16, 5, 4


@pytest.fixture(scope="module")
def pair():
    sp_dist = DistStencilPencil3D.build(
        a=1.0, b=1.1, c_len=0.9, nx=NX, ny=NY, nz=NZ, D=D, dtype=jnp.float64
    )
    sp_single = StencilPencil3D.build(
        a=1.0, b=1.1, c=0.9, nx=NX, ny=NY, nz=NZ, dtype=jnp.float64
    )
    mesh = make_mesh(D)
    return sp_dist, sp_single, mesh


def _apply_dist(sp_dist, mesh, X_stacked, which):
    def body(p, Xl):
        return p.K_mm(Xl) if which == "K" else p.M_mm(Xl)

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(sp_dist.partition_specs(), P(sp_dist.axis, None)),
        out_specs=P(sp_dist.axis, None),
        check_vma=False,
    )
    return jax.jit(mapped)(sp_dist, X_stacked)


@pytest.mark.parametrize("which", ["K", "M"])
def test_dist_stencil_apply_parity(pair, which):
    sp_dist, sp_single, mesh = pair
    rng = np.random.default_rng(0)
    Xg = rng.standard_normal((sp_dist.n_full, 3))
    Xs = jnp.asarray(sp_dist.scatter_vector(Xg))

    Y_dist = sp_dist.gather_vector(np.asarray(_apply_dist(sp_dist, mesh, Xs, which)))

    Xf = jnp.asarray(
        np.pad(Xg, ((0, sp_single.n_padded - sp_single.n), (0, 0)))
    )
    Y_single = np.asarray(
        sp_single.K_mm(Xf) if which == "K" else sp_single.M_mm(Xf)
    )[: sp_single.n]
    np.testing.assert_allclose(Y_dist, Y_single, rtol=1e-12, atol=1e-12)


def test_dist_stencil_roundtrip(pair):
    sp_dist, _, _ = pair
    rng = np.random.default_rng(1)
    Xg = rng.standard_normal((sp_dist.n_full, 2))
    back = sp_dist.gather_vector(sp_dist.scatter_vector(Xg))
    np.testing.assert_allclose(back, Xg, rtol=0, atol=0)


def test_dist_stencil_lobpcg(pair):
    from maxwell_tpu.solvers.dist_solve import lobpcg_dist

    sp_dist, _, mesh = pair
    cav = BrickCavity3D(a=1.0, b=1.1, c=0.9, nx=NX, ny=NY, nz=NZ)
    dense = scipy.linalg.eigh(
        cav.K.toarray(), cav.M.toarray(), eigvals_only=True
    )
    discrete = np.sort(dense[dense > 1e-8])[:3]
    res = lobpcg_dist(
        sp_dist, mesh, nev=3, maxiter=80, tol=1e-8, precond_alpha=15.0
    )
    assert res.converged, f"residuals {res.residuals}"
    np.testing.assert_allclose(res.eigenvalues, discrete, rtol=1e-7)


def test_dist_stencil_materials_parity(pair):
    """Per-cell materials in the slab-sharded pencil == single-device."""
    rng = np.random.default_rng(5)
    eps_r = 1.0 + rng.random((NX, NY, NZ))
    mu_r = 1.0 + rng.random((NX, NY, NZ))
    sp_dist = DistStencilPencil3D.build(
        a=1.0, b=1.1, c_len=0.9, nx=NX, ny=NY, nz=NZ, D=D,
        dtype=jnp.float64, eps_r=eps_r, mu_r=mu_r,
    )
    sp_single = StencilPencil3D.build(
        a=1.0, b=1.1, c=0.9, nx=NX, ny=NY, nz=NZ, dtype=jnp.float64,
        eps_r=eps_r, mu_r=mu_r,
    )
    mesh = make_mesh(D)
    Xg = rng.standard_normal((sp_dist.n_full, 2))
    Xs = jnp.asarray(sp_dist.scatter_vector(Xg))
    for which in ("K", "M"):
        Yd = sp_dist.gather_vector(
            np.asarray(_apply_dist(sp_dist, mesh, Xs, which))
        )
        Xf = jnp.asarray(
            np.pad(Xg, ((0, sp_single.n_padded - sp_single.n), (0, 0)))
        )
        Ys = np.asarray(
            sp_single.K_mm(Xf) if which == "K" else sp_single.M_mm(Xf)
        )[: sp_single.n]
        np.testing.assert_allclose(Yd, Ys, rtol=1e-12, atol=1e-12)


def test_dist_lanczos_on_stencil(mesh_only=None):
    """Distributed Lanczos driver runs on the slab-sharded stencil pencil.
    (Plain Lanczos needs a near-complete Krylov space for the smallest
    modes, so this uses a tiny grid.)"""
    from maxwell_tpu.solvers.dist_solve import lanczos_dist

    nx, ny, nz = 8, 3, 3
    sp_small = DistStencilPencil3D.build(
        nx=nx, ny=ny, nz=nz, D=D, dtype=jnp.float64
    )
    mesh = make_mesh(D)
    cav = BrickCavity3D(nx=nx, ny=ny, nz=nz)
    dense = scipy.linalg.eigh(
        cav.K.toarray(), cav.M.toarray(), eigvals_only=True
    )
    discrete = np.sort(dense[dense > 1e-8])[:3]
    res = lanczos_dist(sp_small, mesh, nev=3, maxiter=330, tol=1e-8)
    assert res.converged, f"residuals {res.residuals}"
    np.testing.assert_allclose(res.eigenvalues, discrete, rtol=1e-8)


def test_dist_spectral_preconditioner_exact():
    """DistSpectralShift (solvers/spectral.py): the distributed spectral
    solve must be an EXACT (K + alpha M)^-1 — apply the slab pencil to the
    solve's output and recover the input on owned unmasked rows."""
    import jax
    from jax.sharding import PartitionSpec as P

    from maxwell_tpu.dist import make_mesh
    from maxwell_tpu.dist.stencil_dist import DistStencilPencil3D
    from maxwell_tpu.solvers.spectral import DistSpectralShift

    D = 8
    sp = DistStencilPencil3D.build(nx=16, ny=5, nz=4, D=D,
                                   dtype=jnp.float64)
    mesh = make_mesh(D)
    alpha = 6.0
    sol = DistSpectralShift.build(sp, alpha)

    def body(p, s, Rl):
        W = s.solve(p, Rl)
        KW, MW = p.KM_mm(W)
        return KW + alpha * MW

    R = sp.make_block(jax.random.PRNGKey(3), 3)
    # restrict to masked rows (the spectral solve only serves the
    # PEC-interior tensor structure)
    mask_g = np.asarray(sp.mask)
    R = R * jnp.asarray(mask_g)[:, None]
    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(sp.partition_specs(), sol.partition_specs(),
                  P(sp.axis, None)),
        out_specs=P(sp.axis, None),
        check_vma=False,
    )
    back = np.asarray(jax.jit(mapped)(sp, sol, R))
    w = np.asarray(sp.w_dot) * mask_g
    np.testing.assert_allclose(
        back[w > 0], np.asarray(R)[w > 0], rtol=1e-10, atol=1e-10
    )
