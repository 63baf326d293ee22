"""Deflation: gradient-nullspace projection and locked-eigenvector deflation
(SURVEY.md §2 C12, §7.5 hard part 2).

The curl-curl stiffness K has the discrete gradient range(G) as an exact,
huge nullspace (one dim per interior node). Solvers must restrict to the
M-orthogonal complement of range(G) or the lambda=0 cluster swamps the
physical modes. The projector

    P x = x - G (G^T M G)^{-1} G^T M x

is the M-orthogonal projector onto that complement; G^T M G is a nodal
Laplacian-class SPD matrix solved with CG. G itself is applied matrix-free
from head/tail node indices (2 nnz per row, gather/scatter — cheap relative
to SpMV and outside the Pallas hot path).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from maxwell_tpu.solvers.cg import cg


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class GradientProjector:
    """M-orthogonal projector onto the complement of the gradient nullspace.

    head/tail: (n,) int32 node ids per (kept) edge; weight: (n,) the signed
    magnitude 1/h_edge (unit-tangential-value basis convention — see
    maxwell_tpu/problems/cavity2d.py). n_nodes interior nodes. Vectors are
    padded to n_padded rows (zero padding preserved).
    """

    head: jax.Array
    tail: jax.Array
    weight: jax.Array
    n: int
    n_nodes: int
    n_padded: int

    def tree_flatten(self):
        return (self.head, self.tail, self.weight), (
            self.n,
            self.n_nodes,
            self.n_padded,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        head, tail, weight = children
        return cls(
            head=head, tail=tail, weight=weight,
            n=aux[0], n_nodes=aux[1], n_padded=aux[2],
        )

    @staticmethod
    def from_gradient(
        G: sp.spmatrix, n_padded: int, dtype=None
    ) -> "GradientProjector":
        """Build from the assembled discrete gradient (rows=edges, cols=nodes),
        entries +w at the head node and -w at the tail node of each edge.

        Edges whose head or tail node was eliminated by the PEC boundary have
        only one entry in G; the missing endpoint maps to a GHOST node slot
        (index n_nodes) that reads as 0 in g_mm and is discarded in gt_mm.
        """
        G = sp.coo_matrix(G)
        n, n_nodes = G.shape
        head = np.full(n, n_nodes, dtype=np.int32)  # default: ghost slot
        tail = np.full(n, n_nodes, dtype=np.int32)
        weight = np.zeros(n, dtype=np.float64)
        pos = G.data > 0
        head[G.row[pos]] = G.col[pos]
        tail[G.row[~pos]] = G.col[~pos]
        weight[G.row[pos]] = G.data[pos]
        weight[G.row[~pos]] = -G.data[~pos]  # same magnitude; covers rows
        # with only a tail entry (head on the boundary)
        return GradientProjector(
            head=jnp.asarray(head),
            tail=jnp.asarray(tail),
            weight=jnp.asarray(weight, dtype=dtype or jnp.float32),
            n=n,
            n_nodes=n_nodes,
            n_padded=n_padded,
        )

    # --- G applies (matrix-free) -----------------------------------------
    def g_mm(self, phi: jax.Array) -> jax.Array:
        """(n_padded, m) <- G @ phi for phi (n_nodes, m)."""
        w = self.weight if phi.ndim == 1 else self.weight[:, None]
        zero = jnp.zeros((1,) + phi.shape[1:], phi.dtype)
        phi_ext = jnp.concatenate([phi, zero], axis=0)  # ghost node reads 0
        out = w * (phi_ext[self.head] - phi_ext[self.tail])  # (n, m)
        pad = self.n_padded - self.n
        if pad:
            out = jnp.pad(out, [(0, pad)] + [(0, 0)] * (out.ndim - 1))
        return out

    def gt_mm(self, y: jax.Array) -> jax.Array:
        """(n_nodes, m) <- G^T @ y for y (n_padded, m)."""
        y = y[: self.n]
        w = self.weight if y.ndim == 1 else self.weight[:, None]
        wy = w * y
        shape = (self.n_nodes + 1,) + y.shape[1:]  # ghost slot at the end
        out = jnp.zeros(shape, y.dtype)
        out = out.at[self.head].add(wy)
        out = out.at[self.tail].add(-wy)
        return out[:-1]

    def project(
        self,
        M_mm: Callable[[jax.Array], jax.Array],
        X: jax.Array,
        tol: float = 1e-10,
        maxiter: int = 150,
        dot=None,
    ) -> jax.Array:
        """X <- X - G (G^T M G)^-1 G^T M X (columns of X, padded shape).

        Defaults 1e-10/150: leaves gradient leakage ~1e-14 — far below the
        1e-8 residual target — at ~15% less cost than 1e-12/400.
        """
        vec_in = X.ndim == 1
        if vec_in:
            X = X[:, None]
        L_mm = lambda phi: self.gt_mm(M_mm(self.g_mm(phi)))
        rhs = self.gt_mm(M_mm(X))
        q = cg(L_mm, rhs, tol=tol, maxiter=maxiter, dot=dot)
        out = X - self.g_mm(q)
        return out[:, 0] if vec_in else out


def deflate_against(
    X: jax.Array, Q: jax.Array, MQ: jax.Array, dot_mm=None
) -> jax.Array:
    """X <- X - Q (MQ^T X): remove components along locked M-orthonormal Q.

    MQ = M @ Q precomputed. dot_mm: (A, B) -> A^T B with global reduction
    under shard_map (defaults to local matmul). SURVEY.md §3.3 deflate step.
    """
    if dot_mm is None:
        dot_mm = lambda A, B: A.T @ B
    return X - Q @ dot_mm(MQ, X)
