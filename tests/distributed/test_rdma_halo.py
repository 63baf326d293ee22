"""Pallas remote-DMA halo exchange vs ppermute oracle (SURVEY.md §2 C8
native checklist #6), interpret mode on the simulated mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from maxwell_tpu.dist import make_mesh, partition_problem
from maxwell_tpu.problems import RectCavity2D
from maxwell_tpu.solvers.dist_solve import spmm_dist

D = 8


def test_rdma_halo_spmm_parity():
    cav = RectCavity2D(nx=16, ny=16)
    dp_pp = partition_problem(cav, D, block=8, dtype=jnp.float64)
    dp_rd = partition_problem(
        cav, D, block=8, dtype=jnp.float64, halo_impl="rdma"
    )
    assert dp_rd.H <= dp_rd.L, "rdma path needs the shallow-halo regime"
    mesh = make_mesh(D)
    key = jax.random.PRNGKey(0)
    n_pad_g = dp_pp.D * dp_pp.L * dp_pp.b
    X = jax.random.normal(key, (n_pad_g, 3), jnp.float64)
    Y_pp = np.asarray(spmm_dist(dp_pp, mesh, X, which="K"))
    Y_rd = np.asarray(spmm_dist(dp_rd, mesh, X, which="K"))
    np.testing.assert_allclose(Y_rd, Y_pp, rtol=0, atol=0)
