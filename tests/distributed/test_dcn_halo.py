"""DCN-aware halo scheduling (round-3 VERDICT item 8): the halo schedule
must BRANCH on link class — links crossing hosts get their permutes
issued first — and stay bit-identical to the gather oracle. Real DCN is
unavailable here; link classes are injected synthetically (the documented
test seam in dist/partition.partition_problem)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from maxwell_tpu.dist import make_mesh, partition_problem
from maxwell_tpu.dist.mesh import mesh_topology_report
from maxwell_tpu.problems import BrickCavity3D

D = 8


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= D
    return make_mesh(D)


def _halo_checksum(dp, mesh, X):
    f = jax.shard_map(
        lambda p, Xl: p.halo_checksum(Xl),
        mesh=mesh,
        in_specs=(dp.partition_specs(), P(dp.axis, None)),
        out_specs=P(),
        check_vma=False,
    )
    return float(jax.jit(f)(dp, X))


def test_dcn_schedule_matches_oracle(mesh):
    """Synthetic DCN links at positions 1 and 3: the split-permute
    schedule must be bit-identical to the all_gather oracle."""
    cav = BrickCavity3D(nx=6, ny=6, nz=6)
    dp = partition_problem(
        cav, D, block=8, dtype=jnp.float64, dcn_links=(1, 3)
    )
    assert dp.dcn_links == (1, 3)
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (dp.D * dp.L * dp.b, 3), dtype=jnp.float64)
    assert _halo_checksum(dp, mesh, X) == 0.0


def test_dcn_schedule_issues_split_permutes(mesh):
    """Structural: with DCN links the schedule contains FOUR ppermutes
    (DCN-left, DCN-right, ICI-left, ICI-right — DCN first), without: two.
    2D 16x16 keeps the RCM halo shallow (H <= L) so the fast path runs."""
    from maxwell_tpu.problems import RectCavity2D

    cav = RectCavity2D(nx=16, ny=16)

    def count_ppermutes(dp):
        def body(p, Xl):
            return p.exchange_halos(Xl)

        X = jnp.zeros((dp.D * dp.L * dp.b, 2))
        f = jax.shard_map(
            body, mesh=mesh,
            in_specs=(dp.partition_specs(), P(dp.axis, None)),
            out_specs=P(dp.axis, None), check_vma=False,
        )
        txt = str(jax.make_jaxpr(f)(dp, X))
        return txt.count("ppermute")

    dp_uniform = partition_problem(cav, D, block=8, dtype=jnp.float64)
    dp_dcn = partition_problem(
        cav, D, block=8, dtype=jnp.float64, dcn_links=(2,)
    )
    # halo may use the deep fallback (no ppermute) on tiny grids; require
    # the fast path for a meaningful structural count
    if dp_uniform.H > dp_uniform.L:
        pytest.skip("tiny grid fell back to deep-halo gather")
    assert count_ppermutes(dp_uniform) == 2
    assert count_ppermutes(dp_dcn) == 4


def test_mesh_derived_links_single_host(mesh):
    """On a single-host mesh the report yields NO DCN links and the
    uniform schedule is used."""
    rep = mesh_topology_report(mesh)
    assert rep["hosts"] == 1 and rep["dcn_links"] == 0
    cav = BrickCavity3D(nx=6, ny=6, nz=6)
    dp = partition_problem(cav, D, block=8, dtype=jnp.float64, mesh=mesh)
    assert dp.dcn_links == ()


def test_dcn_solve_parity(mesh):
    """Full distributed eigensolve with the DCN-split schedule matches the
    dense oracle (the schedule change must not perturb the math)."""
    import scipy.linalg

    from maxwell_tpu.solvers.dist_solve import lobpcg_dist

    cav = BrickCavity3D(nx=6, ny=6, nz=6)
    dp = partition_problem(
        cav, D, block=8, dtype=jnp.float64, dcn_links=(3,)
    )
    res = lobpcg_dist(
        dp, mesh, nev=3, maxiter=60, tol=1e-8, precond_alpha=15.0
    )
    dense = scipy.linalg.eigh(
        cav.K.toarray(), cav.M.toarray(), eigvals_only=True
    )
    discrete = np.sort(dense[dense > 1e-8])[:3]
    assert res.converged
    np.testing.assert_allclose(res.eigenvalues, discrete, rtol=1e-7)
