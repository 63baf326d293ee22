"""Tile-union blocked sparse layout ("BELLUnion") — the production layout
for the general-matrix Pallas SpMM (SURVEY.md §2 C4/C5).

Measured design history on the chip (bench/exp_spmm.py, exp_gather.py,
exp_grid.py, exp_union.py; 24^3 curl-curl, RCM):

1. Every per-block-row formulation is dominated NOT by the X gather
   (~1 ns/vreg sublane slice) nor by grid-step overhead (~40 ns) but by
   the shape of the contraction: batched (8, K)@(K, 8) einsums leave the
   MXU ~0.4% utilized and cost ~1 us per chunk (exp_grid e5 vs e4).
2. One WELL-SHAPED (128, K)@(K, m) dot per 128-row tile runs the whole
   apply at 70% of the HBM roofline with f32-true (HIGHEST) precision
   (exp_union u0_hi), and the gather of the tile's column UNION is ~2%
   of the cost.

Layout: per 128-row tile, the union U_t of its block-columns (mean 123 on
the 24^3 operator — adjacent rows share most columns) is chunked into
groups of 16 block-cols (= 128 lanes). Chunks of ALL tiles are stored
CONSECUTIVELY in one flat (NC_total*128, 128) value array — ragged, zero
padding chunks — with per-chunk column ids and tile ownership driving a
Pallas grid over chunks: each step streams one (128, 128) value tile,
gathers 16 (8, m) X slices, and accumulates one (128, 128)@(128, m) dot
into the owning tile's output block (outputs are revisited consecutively,
so Pallas keeps them resident until the tile changes).

Values within a chunk are scattered to their column's lane group; absent
columns are zero-filled (fill factor ~23% on the 24^3 operator — the
bandwidth cost of the well-shaped dot, still 3-13x faster end-to-end than
every gather-per-block alternative measured).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BELLUnion:
    """Tile-union chunked sparse matrix (see module docstring).

    vals:    (NC_total*128, 128) f32 — chunk k occupies rows [128k, 128k+128);
             row r of a chunk is tile row r; lane group g holds the block
             for column ucols[k, g] (zeros if that column is absent in the
             row or the group is padding).
    ucols:   (NC_total, 16) int32 — block-column of each lane group
             (padding groups repeat a valid column; their values are zero).
    tile_of: (NC_total,) int32 — owning 128-row tile of each chunk.
    first:   (NC_total,) int32 — 1 on a tile's first chunk (output init).
    vals_b:  optional second value stream (e.g. the mass matrix on the
             union pattern) sharing the same structure.
    """

    vals: jax.Array
    ucols: jax.Array
    tile_of: jax.Array
    first: jax.Array
    n: int
    n_tiles: int
    b: int = 8
    # chunk width in lanes. 512 (64 block-cols ~ half a mean tile union)
    # amortizes the measured ~300 ns fixed per-chunk cost (dot setup +
    # output read-modify-write) that 128-lane chunks pay 8x per tile:
    # 29.5% -> ~70% of roofline on the 24^3 operator.
    cl: int = 512
    vals_b: jax.Array | None = None

    def tree_flatten(self):
        return (
            self.vals, self.ucols, self.tile_of, self.first, self.vals_b,
        ), (self.n, self.n_tiles, self.b, self.cl)

    @classmethod
    def tree_unflatten(cls, aux, children):
        vals, ucols, tile_of, first, vals_b = children
        return cls(
            vals=vals, ucols=ucols, tile_of=tile_of, first=first,
            vals_b=vals_b, n=aux[0], n_tiles=aux[1], b=aux[2], cl=aux[3],
        )

    @property
    def n_padded(self) -> int:
        return self.n_tiles * 128

    @property
    def n_chunks(self) -> int:
        return self.tile_of.shape[0]

    @property
    def nnz_dense(self) -> int:
        """Stored = streamed dense entries (ragged layout has no dead
        chunks; zero-fill within live chunks is the only padding)."""
        return self.vals.size

    # ------------------------------------------------------------------
    @staticmethod
    def from_csr(
        A: sp.spmatrix,
        block: int = 8,
        dtype=jnp.float32,
        B: sp.spmatrix | None = None,
        chunk_lanes: int = 512,
    ) -> "BELLUnion":
        """Build from CSR. With B given, both value streams share the
        union sparsity structure (one layout serves K and M applies)."""
        b = block
        R = 128 // b
        cl = chunk_lanes
        CG = cl // b  # block-columns per chunk
        A = sp.csr_matrix(A)
        n = A.shape[0]
        n_pad = _round_up(max(n, 1), 128)

        def _pad_bsr(C):
            Cp_ = sp.csr_matrix((C.data, C.indices, C.indptr), shape=C.shape)
            Cp_.resize((n_pad, n_pad))
            Cb = Cp_.tobsr(blocksize=(b, b))
            Cb.sort_indices()
            return Cb

        if B is not None:
            B = sp.csr_matrix(B)
            U = ((A != 0) + (B != 0)).tocsr()
            U.sort_indices()
            Uc = U.tocoo()

            def _sample(C):
                return np.asarray(C[Uc.row, Uc.col]).ravel()

            Au = sp.csr_matrix(
                (_sample(A), U.indices.copy(), U.indptr.copy()), shape=A.shape
            )
            Bu = sp.csr_matrix(
                (_sample(B), U.indices.copy(), U.indptr.copy()), shape=A.shape
            )
            Ab, Bb = _pad_bsr(Au), _pad_bsr(Bu)
            assert np.array_equal(Ab.indices, Bb.indices)
            data_b = Bb.data
        else:
            Ab = _pad_bsr(A)
            data_b = None
        indptr, indices, data = Ab.indptr, Ab.indices, Ab.data
        nbr = n_pad // b
        n_tiles = nbr // R

        # per-tile column unions and chunk counts
        uni = []  # per tile: sorted unique block-cols, padded to CG mult
        nck = np.empty(n_tiles, dtype=np.int64)
        for t in range(n_tiles):
            u = np.unique(indices[indptr[t * R] : indptr[(t + 1) * R]])
            if u.size == 0:
                u = np.zeros(1, dtype=indices.dtype)
            k = -(-u.size // CG)
            up = np.full(k * CG, u[-1], dtype=np.int64)
            up[: u.size] = u
            uni.append(up)
            nck[t] = k
        NC = int(nck.sum())
        chunk0 = np.concatenate([[0], np.cumsum(nck)])

        ucols = np.concatenate(uni).reshape(NC, CG).astype(np.int32)
        tile_of = np.repeat(np.arange(n_tiles, dtype=np.int32), nck)
        first = np.zeros(NC, dtype=np.int32)
        first[chunk0[:-1]] = 1

        # scatter blocks into the flat chunk array (vectorized over blocks)
        # (chunk row stride is 128 rows x cl lanes)
        nblk = indices.size
        brow = np.repeat(np.arange(nbr), np.diff(indptr))
        tile = brow // R
        rloc = brow % R
        # position of each block's column within its tile's union
        pos = np.empty(nblk, dtype=np.int64)
        for t in range(n_tiles):
            lo, hi = indptr[t * R], indptr[(t + 1) * R]
            pos[lo:hi] = np.searchsorted(uni[t], indices[lo:hi])
        chunk = chunk0[tile] + pos // CG
        lane_g = pos % CG

        np_dt = np.dtype(jnp.zeros((), dtype).dtype)
        ii, jj = np.meshgrid(np.arange(b), np.arange(b), indexing="ij")
        rows = (chunk * 128 + rloc * b)[:, None, None] + ii[None]
        cols_ = (lane_g * b)[:, None, None] + jj[None]

        def _fill(d):
            v = np.zeros((NC * 128, cl), dtype=np_dt)
            v[rows, cols_] = d
            return v

        return BELLUnion(
            vals=jnp.asarray(_fill(data)),
            ucols=jnp.asarray(ucols),
            tile_of=jnp.asarray(tile_of),
            first=jnp.asarray(first),
            vals_b=None if data_b is None else jnp.asarray(_fill(data_b)),
            n=n,
            n_tiles=n_tiles,
            b=b,
            cl=cl,
        )

    def to_csr(self, stream: str = "a") -> sp.csr_matrix:
        """Round-trip for testing."""
        b = self.b
        vals = np.asarray(self.vals if stream == "a" else self.vals_b)
        ucols = np.asarray(self.ucols)
        tile_of = np.asarray(self.tile_of)
        CG = self.cl // b
        rows, cols, blocks = [], [], []
        for k in range(self.n_chunks):
            vk = vals[128 * k : 128 * (k + 1)]
            for rl in range(128 // b):
                for g in range(CG):
                    blk = vk[rl * b : (rl + 1) * b, g * b : (g + 1) * b]
                    if np.any(blk != 0.0):
                        rows.append(tile_of[k] * (128 // b) + rl)
                        cols.append(ucols[k, g])
                        blocks.append(blk)
        n_pad = self.n_padded
        if not rows:
            return sp.csr_matrix((self.n, self.n))
        coo_r = np.repeat(
            np.asarray(rows) * b, b * b
        ) + np.tile(np.repeat(np.arange(b), b), len(rows))
        coo_c = np.repeat(
            np.asarray(cols) * b, b * b
        ) + np.tile(np.tile(np.arange(b), b), len(rows))
        out = sp.coo_matrix(
            (np.asarray(blocks).ravel(), (coo_r, coo_c)), shape=(n_pad, n_pad)
        ).tocsr()
        return out[: self.n, : self.n].tocsr()

    # ------------------------------------------------------------------
    def banded(self, m: int, budget_bytes: int = 10 * 1024 * 1024):
        """Row-band split whose contiguous X windows fit the VMEM budget
        at block width m (same plan as BELLPairs.banded — VERDICT item 2)."""
        b = self.b
        tile_of = np.asarray(self.tile_of)
        ucols = np.asarray(self.ucols)
        cmin_t = np.full(self.n_tiles, np.iinfo(np.int64).max)
        cmax_t = np.zeros(self.n_tiles, dtype=np.int64)
        np.minimum.at(cmin_t, tile_of, ucols.min(axis=1))
        np.maximum.at(cmax_t, tile_of, ucols.max(axis=1) + 1)
        max_rows = budget_bytes // (4 * m)

        vals = np.asarray(self.vals)
        vals_b = None if self.vals_b is None else np.asarray(self.vals_b)
        first = np.asarray(self.first)
        chunk_of_tile0 = np.searchsorted(tile_of, np.arange(self.n_tiles))

        bands = []
        t0 = 0
        while t0 < self.n_tiles:
            t1 = t0 + 1
            c0, c1 = cmin_t[t0], cmax_t[t0]
            while t1 < self.n_tiles:
                nc0, nc1 = min(c0, cmin_t[t1]), max(c1, cmax_t[t1])
                if (nc1 - nc0) * b > max_rows:
                    break
                c0, c1, t1 = nc0, nc1, t1 + 1
            if (c1 - c0) * b > max_rows:
                raise ValueError(
                    "single tile window exceeds the X budget: reorder the "
                    "matrix (RCM) or raise budget_bytes"
                )
            k0 = chunk_of_tile0[t0]
            k1 = (
                chunk_of_tile0[t1] if t1 < self.n_tiles else self.n_chunks
            )
            sub = BELLUnion(
                vals=jnp.asarray(vals[k0 * 128 : k1 * 128]),
                ucols=jnp.asarray(
                    (ucols[k0:k1] - c0).astype(np.int32)
                ),
                tile_of=jnp.asarray(
                    (tile_of[k0:k1] - t0).astype(np.int32)
                ),
                first=jnp.asarray(first[k0:k1]),
                vals_b=None
                if vals_b is None
                else jnp.asarray(vals_b[k0 * 128 : k1 * 128]),
                n=(t1 - t0) * 128,
                n_tiles=t1 - t0,
                b=b,
                cl=self.cl,
            )
            bands.append((sub, int(c0) * b, int(c1 - c0) * b))
            t0 = t1
        return BandedBELLUnion(
            bands=tuple(x[0] for x in bands),
            col_starts=tuple(x[1] for x in bands),
            col_rows=tuple(x[2] for x in bands),
            n=self.n,
            b=b,
        )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BandedBELLUnion:
    """Row-band split of a BELLUnion for X beyond the VMEM budget."""

    bands: tuple
    col_starts: tuple[int, ...]
    col_rows: tuple[int, ...]
    n: int
    b: int

    def tree_flatten(self):
        return (self.bands,), (self.col_starts, self.col_rows, self.n, self.b)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(bands=tuple(children[0]), col_starts=aux[0],
                   col_rows=aux[1], n=aux[2], b=aux[3])

    @property
    def n_padded(self) -> int:
        return sum(bp.n_padded for bp in self.bands)

    @property
    def nnz_dense(self) -> int:
        return sum(bp.nnz_dense for bp in self.bands)
