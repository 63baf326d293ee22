"""Paired, per-tile-chunked blocked-ELL storage ("BELLPairs") — the round-2
production layout for the general-matrix Pallas SpMM (SURVEY.md §2 C4/C5;
round-1 VERDICT item 1).

Measured on the chip (maxwell_tpu/bench/exp_spmm.py, 24^3 curl-curl, RCM):
the blocked-ELL kernel is GATHER-BOUND — each dynamic (b, m) X-slice costs
~3 ns regardless of where the column indices live, while value streaming +
one (128, S*b)@(S*b, m) dot per tile runs at 91% of the HBM roofline. The
two layout levers that cut slice count and padded traffic:

1. PAIRS: 92% of this matrix class's blocks sit in runs of >= 2 consecutive
   block-columns (RCM bands), so slots store (b, 2b) PAIRS of adjacent
   blocks — one (2b, m) slice covers two blocks. Singleton runs zero-pad
   the second half of the pair.
2. PER-TILE CHUNKS: mean real blocks/row is ~28 vs the ELL max of 64 —
   global ELL padding doubles both traffic and slices. Pair slots are
   grouped into chunks of Cp; each 128-row tile stores/visits only
   ceil(max_pairs_in_tile / Cp) chunks. The kernel grid is
   (n_tiles, max_chunks) with the chunk index CLAMPED in the BlockSpec
   index map — Pallas elides refetches of repeated blocks, and a pl.when
   skips the dead compute — so padded chunks cost neither bandwidth nor
   slices, only HBM capacity.
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
class BandedBELLPairs:
    """Row-band split of a BELLPairs matrix for X beyond the VMEM budget:
    each band is a standalone BELLPairs with window-rebased columns plus
    the contiguous X slice it consumes. See BELLPairs.banded()."""

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


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BELLPairs:
    """Paired chunked blocked-ELL matrix.

    vals2d: (n_brows*b, max_ch*Cp*2b) f32 — row r*b+i holds that block row's
            pair slots side by side; slot q covers block-cols
            (cols[r, q], cols[r, q]+1).
    cols:   (n_brows, max_ch*Cp) int32 pair-start block-column (0 padding).
    nch:    (n_tiles,) int32 — live chunks per 128-row tile.
    """

    vals2d: jax.Array
    cols: jax.Array
    nch: jax.Array
    # live pair-slot count per block-row (host metadata for window/band
    # computation; padding slots beyond it hold col 0 / zero values)
    npairs: jax.Array | None
    n: int
    b: int = 8
    Cp: int = 8
    # second value stream sharing the SAME pair/chunk structure — holds the
    # mass matrix M so the solver's KM_mm gathers X once and contracts twice
    # (K and M come from the same mesh connectivity, so one union pattern
    # serves both; see kernels/spmm.py bellpairs_km_matmat_pallas)
    vals2d_b: jax.Array | None = None
    # windowed-kernel metadata (X too big for VMEM): per-tile aligned X
    # window start (in win_unit block-row units) and window-relative pair
    # columns — same scheme as BSRMatrix windows
    win_start: jax.Array | None = None
    cols_rel: jax.Array | None = None
    win_unit: int = 0

    def tree_flatten(self):
        return (
            self.vals2d, self.cols, self.nch, self.npairs, self.vals2d_b,
            self.win_start, self.cols_rel,
        ), (self.n, self.b, self.Cp, self.win_unit)

    @classmethod
    def tree_unflatten(cls, aux, children):
        vals2d, cols, nch, npairs, vals2d_b, win_start, cols_rel = children
        return cls(
            vals2d=vals2d, cols=cols, nch=nch, npairs=npairs, n=aux[0],
            b=aux[1], Cp=aux[2], vals2d_b=vals2d_b, win_start=win_start,
            cols_rel=cols_rel, win_unit=aux[3],
        )

    @property
    def n_brows(self) -> int:
        return self.cols.shape[0]

    @property
    def n_padded(self) -> int:
        return self.n_brows * self.b

    @property
    def max_ch(self) -> int:
        return self.cols.shape[1] // self.Cp

    @property
    def n_tiles(self) -> int:
        return self.nch.shape[0]

    @property
    def nnz_dense(self) -> int:
        """STORED dense entries (HBM capacity)."""
        return self.vals2d.size

    @property
    def nnz_streamed(self) -> int:
        """Entries actually FETCHED per apply (live chunks only) — the
        bandwidth-relevant count for the roofline."""
        R = 128 // self.b
        return int(np.asarray(self.nch).sum()) * R * self.b * self.Cp * 2 * self.b

    # ------------------------------------------------------------------
    @staticmethod
    def from_csr(
        A: sp.spmatrix,
        block: int = 8,
        Cp: int = 8,
        dtype=jnp.float32,
        B: sp.spmatrix | None = None,
    ) -> "BELLPairs":
        """Build from CSR. With B given (e.g. the mass matrix), both value
        streams share ONE union sparsity structure so the fused kernel
        gathers X once per slot and contracts against both."""
        b = block
        R = 128 // b
        A = sp.csr_matrix(A)
        n = A.shape[0]
        n_pad = _round_up(max(n, 1), b * R)

        def _pad_bsr(C):
            Cp_ = sp.csr_matrix((C.data, C.indices, C.indptr), shape=C.shape)
            Cp_.resize((n_pad, n_pad))
            Cb = Cp_.tobsr(blocksize=(b, b))
            Cb.sort_indices()
            return Cb

        if B is not None:
            B = sp.csr_matrix(B)
            # sample both matrices at the UNION pattern's coordinates so
            # the two CSRs (and hence BSR conversions) share identical
            # (indptr, indices) — scipy's `+` may cancel/prune entries
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

        # greedy pairing of sorted block-cols per row, fully vectorized:
        # within each run of consecutive block-cols, greedy-from-left pair
        # starts sit at EVEN offsets into the run (row boundaries force
        # run breaks)
        L = indices.size
        row_of = np.repeat(np.arange(nbr), np.diff(indptr))
        brk = np.ones(L, dtype=bool)
        if L > 1:
            brk[1:] = (indices[1:] != indices[:-1] + 1) | (
                row_of[1:] != row_of[:-1]
            )
        run_first_idx = np.nonzero(brk)[0]
        run_id = np.cumsum(brk) - 1
        off = np.arange(L) - run_first_idx[run_id]
        is_start = (off % 2) == 0
        has_next = np.zeros(L, dtype=bool)
        if L > 1:
            has_next[:-1] = run_id[1:] == run_id[:-1]
        is_pair = is_start & has_next

        kl = np.nonzero(is_start)[0]          # slot left-block data index
        s_row = row_of[kl]
        s_col = indices[kl].astype(np.int64)
        s_pair = is_pair[kl]
        npairs = np.bincount(s_row, minlength=nbr).astype(np.int32)
        slot_off = np.concatenate([[0], np.cumsum(npairs)])
        s_q = np.arange(kl.size) - slot_off[s_row]

        Pt = npairs.reshape(n_tiles, R).max(axis=1)
        nch = (-(-np.maximum(Pt, 1) // Cp)).astype(np.int32)
        max_ch = int(nch.max()) if n_tiles else 1
        Q = max_ch * Cp

        np_dt = np.dtype(jnp.zeros((), dtype).dtype)
        vals = np.zeros((nbr, Q, b, 2 * b), dtype=np_dt)
        vals_b = None if data_b is None else np.zeros_like(vals)
        cols = np.zeros((nbr, Q), dtype=np.int32)
        # clamp so the (2b, m) X slice stays in bounds for a singleton in
        # the LAST block column
        clamp = (~s_pair) & (s_col + 1 >= nbr)
        cols[s_row, s_q] = np.where(clamp, s_col - 1, s_col).astype(np.int32)
        for v, d in [(vals, data)] + (
            [] if vals_b is None else [(vals_b, data_b)]
        ):
            nc = ~clamp
            v[s_row[nc], s_q[nc], :, :b] = d[kl[nc]]
            v[s_row[clamp], s_q[clamp], :, b:] = d[kl[clamp]]
            v[s_row[s_pair], s_q[s_pair], :, b:] = d[kl[s_pair] + 1]

        def _to2d(v):
            return np.ascontiguousarray(
                v.transpose(0, 2, 1, 3).reshape(nbr * b, Q * 2 * b)
            )

        vals2d = _to2d(vals)
        vals2d_b = None if vals_b is None else _to2d(vals_b)

        # per-tile aligned X-window metadata (live slots only; +1 covers
        # the pair's second block column)
        live = np.arange(Q)[None, :] < npairs[:, None]
        big = np.where(live, cols, np.iinfo(np.int32).max)
        small = np.where(live, cols + 1, -1)
        cmin = np.minimum(
            big.reshape(n_tiles, R * Q).min(axis=1), max(nbr - 1, 0)
        )
        cmax = small.reshape(n_tiles, R * Q).max(axis=1)
        span = np.maximum(cmax - cmin + 1, 1)
        W_u = int(span.max())
        ws = (cmin // W_u).astype(np.int32)
        rel = cols - np.repeat(ws, R)[:, None] * W_u
        rel = np.where(live, rel, 0).astype(np.int32)
        ok = rel.min() >= 0 and not (rel[live] + 1 >= 2 * W_u).any()

        return BELLPairs(
            vals2d=jnp.asarray(vals2d),
            cols=jnp.asarray(cols),
            nch=jnp.asarray(nch),
            npairs=jnp.asarray(npairs),
            n=n, b=b, Cp=Cp,
            vals2d_b=None if vals2d_b is None else jnp.asarray(vals2d_b),
            win_start=jnp.asarray(ws) if ok else None,
            cols_rel=jnp.asarray(rel) if ok else None,
            win_unit=W_u if ok else 0,
        )

    # ------------------------------------------------------------------
    def banded(self, m: int, budget_bytes: int = 10 * 1024 * 1024):
        """Split into row bands whose X windows fit the VMEM budget at
        block width m — the VMEM-unbounded execution plan (round-1 VERDICT
        item 2). Consecutive tiles under a bandwidth-reducing ordering have
        monotone, overlapping column windows, so each band consumes one
        CONTIGUOUS X slice; total X traffic is n + inter-band overlap
        (vs. the per-tile window refetch of a windowed kernel, which
        re-reads X ~span/tile-step times)."""
        b, R, Cp = self.b, 128 // self.b, self.Cp
        nbr, Q = self.cols.shape
        n_tiles = self.n_tiles
        cols = np.asarray(self.cols)
        nch = np.asarray(self.nch)
        vals = np.asarray(self.vals2d)
        vals_b = None if self.vals2d_b is None else np.asarray(self.vals2d_b)

        # padding slots hold col 0 / zero values — mask them out of the
        # window computation (they are harmless wherever they point after
        # clamping, but would pin every window's min to 0)
        live = (
            np.arange(Q)[None, :]
            < np.asarray(self.npairs)[:, None]
        )
        big = np.where(live, cols, np.iinfo(np.int32).max)
        small = np.where(live, cols, -1)
        cmin_t = np.minimum(
            big.reshape(n_tiles, R * Q).min(axis=1), nbr - 1
        )
        cmax_t = small.reshape(n_tiles, R * Q).max(axis=1) + 2  # pair spill
        # a tile with ZERO live slots would yield an inverted window
        # (cmin=nbr-1, cmax=1) and a failing slice downstream — clamp it to
        # a degenerate valid window at the tile's own diagonal block
        # (values there are all zero, so any in-range window is correct)
        # — round-2 advisor finding, low
        empty = ~live.reshape(n_tiles, R * Q).any(axis=1)
        own = np.minimum(np.arange(n_tiles) * R, max(nbr - 2, 0))
        cmin_t = np.where(empty, own, cmin_t)
        cmax_t = np.where(empty, own + 2, cmax_t)
        max_rows = budget_bytes // (4 * m)

        bands = []
        t0 = 0
        while t0 < n_tiles:
            t1 = t0 + 1
            c0, c1 = cmin_t[t0], cmax_t[t0]
            while t1 < n_tiles:
                nc0, nc1 = min(c0, cmin_t[t1]), max(c1, cmax_t[t1])
                if (nc1 - nc0 + 1) * b > max_rows:
                    break
                c0, c1, t1 = nc0, nc1, t1 + 1
            if (c1 - c0 + 1) * b > max_rows:
                raise ValueError(
                    f"single tile window exceeds X budget ({m=}): reorder "
                    "the matrix (RCM) or raise budget_bytes"
                )
            r0, r1 = t0 * R, t1 * R
            sub_cols = np.maximum(cols[r0:r1] - c0, 0).astype(np.int32)
            sub = BELLPairs(
                vals2d=jnp.asarray(vals[r0 * b : r1 * b]),
                cols=jnp.asarray(sub_cols),
                nch=jnp.asarray(nch[t0:t1]),
                npairs=self.npairs[r0:r1],
                n=(r1 - r0) * b,
                b=b,
                Cp=Cp,
                vals2d_b=None
                if vals_b is None
                else jnp.asarray(vals_b[r0 * b : r1 * b]),
            )
            bands.append((sub, int(c0) * b, int(c1 - c0 + 1) * b))
            t0 = t1
        return BandedBELLPairs(
            bands=tuple(x[0] for x in bands),
            col_starts=tuple(x[1] for x in bands),
            col_rows=tuple(x[2] for x in bands),
            n=self.n,
            b=b,
        )

    def to_csr(self) -> sp.csr_matrix:
        """Round-trip for testing."""
        b, Cp = self.b, self.Cp
        nbr, Q = self.cols.shape
        vals = (
            np.asarray(self.vals2d)
            .reshape(nbr, b, Q, 2 * b)
            .transpose(0, 2, 1, 3)
        )
        cols = np.asarray(self.cols)
        rows, cs, blocks = [], [], []
        for r in range(nbr):
            for q in range(Q):
                for half in (0, 1):
                    blk = vals[r, q, :, half * b : (half + 1) * b]
                    if np.any(blk != 0.0):
                        rows.append(r)
                        cs.append(cols[r, q] + half)
                        blocks.append(blk)
        if not rows:
            return sp.csr_matrix((self.n, self.n))
        Absr = sp.bsr_matrix(
            (
                np.asarray(blocks),
                np.asarray(cs),
                np.concatenate([[0], np.cumsum(np.bincount(rows, minlength=nbr))]),
            ),
            shape=(self.n_padded, self.n_padded),
        ).tocsr()
        # bsr wants column indices sorted per row — rebuild via COO to be safe
        Absr.sum_duplicates()
        return Absr[: self.n, : self.n].tocsr()
