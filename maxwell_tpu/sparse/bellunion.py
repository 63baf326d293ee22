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


def _aligned_zeros(shape, dtype):
    """64-byte-aligned zeros — lets `_to_jax` hand the buffer to the CPU
    backend zero-copy via DLPack (an unaligned 2 GB vals array costs ~15 s
    of plain device_put memcpy; measured round-3).

    Allocation is calloc-backed (np.zeros): large allocations are
    untouched virtual zero pages, so only the ~23%-fill pages the block
    scatter actually writes ever get faulted in. (An earlier
    mmap(MAP_POPULATE) variant eagerly populated the whole buffer and
    cost 13.6 s of a 15.8 s 48^3 build — measured round-3.)

    Large buffers are additionally PRE-FAULTED by a thread pool:
    single-threaded page faulting on this host runs at ~0.2-0.4 GB/s
    (fault servicing is RPC-bound, not CPU-bound) while 8 concurrent
    touchers reach ~4.4 GB/s — measured round-3; the block scatter then
    writes into resident pages at memory speed."""
    size = int(np.prod(shape))
    per = max(64 // np.dtype(dtype).itemsize, 1)
    buf = np.zeros(size + per, dtype)
    nbytes = buf.nbytes
    if nbytes >= 1 << 26:
        from concurrent.futures import ThreadPoolExecutor

        raw = buf.view(np.uint8)
        k = 8
        step = -(-nbytes // k)

        def _touch(i):
            raw[i * step : min((i + 1) * step, nbytes) : 4096] = 0

        with ThreadPoolExecutor(k) as ex:
            list(ex.map(_touch, range(k)))
    off = (-(buf.ctypes.data // np.dtype(dtype).itemsize)) % per
    return buf[off : off + size].reshape(shape)


def _to_jax(v: np.ndarray) -> jax.Array:
    """Move a host array to the default backend: zero-copy DLPack aliasing
    on CPU (callers must not mutate v afterwards), plain transfer
    otherwise."""
    try:
        if jax.default_backend() == "cpu" and v.ctypes.data % 64 == 0:
            return jnp.from_dlpack(v)
    except Exception:
        pass
    return jnp.asarray(v)


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
    # column-space size when RECTANGULAR (e.g. a distributed shard's
    # boundary part gathering from the halo buffer); None = square
    n_cols: int | None = None

    def tree_flatten(self):
        return (
            self.vals, self.ucols, self.tile_of, self.first, self.vals_b,
        ), (self.n, self.n_tiles, self.b, self.cl, self.n_cols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        vals, ucols, tile_of, first, vals_b = children
        return cls(
            vals=vals, ucols=ucols, tile_of=tile_of, first=first,
            vals_b=vals_b, n=aux[0], n_tiles=aux[1], b=aux[2], cl=aux[3],
            n_cols=aux[4],
        )

    @property
    def n_padded(self) -> int:
        return self.n_tiles * 128

    @property
    def n_cols_padded(self) -> int:
        """Rows the gathered-from X buffer must have."""
        if self.n_cols is None:
            return self.n_padded
        return _round_up(max(self.n_cols, 1), self.b)

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
        ncols: int | None = None,
        to_device: bool = True,
    ) -> "BELLUnion":
        """Build from CSR. With B given, both value streams share the
        union sparsity structure (one layout serves K and M applies).
        ncols: explicit column-space size for RECTANGULAR matrices (the
        gathered-from X buffer); None keeps the square n_padded layout.
        to_device=False keeps the leaves as host numpy arrays (pure-host
        build timing / staging before an explicit device_put).

        Fully vectorized host build (round-2 VERDICT item 9): per-tile
        unions via one global sort of (tile, col) keys, union positions via
        one global searchsorted — no Python loop over tiles.
        """
        b = block
        R = 128 // b
        cl = chunk_lanes
        CG = cl // b  # block-columns per chunk
        A = sp.csr_matrix(A)
        n = A.shape[0]
        n_pad = _round_up(max(n, 1), 128)
        rect = ncols is not None
        nc_pad = _round_up(max(ncols, 1), b) if rect else n_pad

        def _pad_bsr(C):
            # NOTE: block indices stay UNSORTED within block rows (tobsr
            # order) — the union build only needs the sorted `uk` keys, and
            # each block is placed by searchsorted, so sorting the (b, b)
            # block data (the old build's second-largest cost) is skipped
            Cp_ = sp.csr_matrix((C.data, C.indices, C.indptr), shape=C.shape)
            Cp_.resize((n_pad, nc_pad))
            return Cp_.tobsr(blocksize=(b, b))

        nbr = n_pad // b
        ncb = nc_pad // b
        n_tiles = nbr // R

        def _bkeys(Cb):
            """(tile, block-col) composite keys + block-row locals."""
            brow = np.repeat(np.arange(nbr), np.diff(Cb.indptr))
            tile = (brow // R).astype(np.int64)
            return tile * ncb + Cb.indices, brow % R

        Ab = _pad_bsr(A)
        kA, rlocA = _bkeys(Ab)
        if B is not None:
            Bb = _pad_bsr(sp.csr_matrix(B))
            kB, rlocB = _bkeys(Bb)
            # dedup (tile, col) keys — the per-tile union of both streams
            uk = np.union1d(np.unique(kA), np.unique(kB))
        else:
            Bb = None
            uk = np.unique(kA)

        # every tile needs >= 1 union column (zero-valued col 0 if empty)
        have = np.zeros(n_tiles, dtype=bool)
        have[(uk // ncb)] = True
        if not have.all():
            synth = np.flatnonzero(~have).astype(np.int64) * ncb
            uk = np.union1d(uk, synth)
        ut = uk // ncb  # tile of each unique (tile, col)
        uc = (uk % ncb).astype(np.int64)  # sorted unique cols per tile
        usize = np.bincount(ut, minlength=n_tiles)
        first_u = np.concatenate([[0], np.cumsum(usize)])  # (n_tiles+1,)

        nck = -(-usize // CG)  # chunks per tile
        NC = int(nck.sum())
        chunk0 = np.concatenate([[0], np.cumsum(nck)])

        # padded unions: init every slot with the tile's LAST column, then
        # overwrite the live prefix
        last_uc = uc[first_u[1:] - 1]  # per tile
        ucols_flat = np.repeat(last_uc, nck * CG)
        pos_u = np.arange(uk.size) - first_u[ut]  # rank within tile union
        ucols_flat[chunk0[ut] * CG + pos_u] = uc
        ucols = ucols_flat.reshape(NC, CG).astype(np.int32)

        tile_of = np.repeat(np.arange(n_tiles, dtype=np.int32), nck)
        first = np.zeros(NC, dtype=np.int32)
        first[chunk0[:-1]] = 1

        # --- scatter blocks of each stream into its flat chunk array -----
        np_dt = np.dtype(jnp.zeros((), dtype).dtype)

        # allocate + pre-fault BOTH value buffers BEFORE any scatter: page
        # faulting on this host degrades ~10x once a large write pass has
        # run (measured round-3: 0.5 s -> 5.8 s for the same 1.9 GB
        # pre-fault after one strided write), so fresh-buffer faults must
        # all happen first
        vA = _aligned_zeros((NC * 128, cl), np_dt)
        vB = None if Bb is None else _aligned_zeros((NC * 128, cl), np_dt)

        def _fill(keys, rloc, d, v):
            """Place each (b, b) block at (chunk*128 + rloc*b, lane_g*b);
            a single flat fancy-index write (no (nblk, b, b) index
            broadcast — the measured hot spot of the old build)."""
            tile = keys // ncb
            pos = np.searchsorted(uk, keys) - first_u[tile]
            chunk = chunk0[tile] + pos // CG
            lane_g = pos % CG
            # view as (chunk, rloc, b, lane_g, b): block writes contiguous
            v6 = v.reshape(NC, R, b, CG, b)
            v6[chunk, rloc, :, lane_g, :] = d
            return v

        dev = _to_jax if to_device else (lambda v: v)
        devs = jnp.asarray if to_device else np.asarray
        return BELLUnion(
            vals=dev(_fill(kA, rlocA, Ab.data, vA)),
            ucols=devs(ucols),
            tile_of=devs(tile_of),
            first=devs(first),
            vals_b=None
            if Bb is None
            else dev(_fill(kB, rlocB, Bb.data, vB)),
            n=n,
            n_tiles=n_tiles,
            b=b,
            cl=cl,
            n_cols=ncols,
        )

    def pad_chunks(self, NC: int) -> "BELLUnion":
        """Pad the flat chunk list to NC chunks (host-side; leaves must be
        numpy — build with to_device=False). Padding chunks carry zero
        values, point at the LAST tile with first=0 and column 0, so they
        accumulate exact zeros. Used by the distributed partitioner: shards
        have ragged chunk counts but shard_map needs uniform leaves."""
        cur = self.n_chunks
        if cur == NC:
            return self
        if cur > NC:
            raise ValueError(f"cannot shrink {cur} chunks to {NC}")
        pad = NC - cur
        CG = self.cl // self.b

        def _padv(v):
            if v is None:
                return None
            out = _aligned_zeros((NC * 128, self.cl), v.dtype)
            out[: cur * 128] = v
            return out

        return BELLUnion(
            vals=_padv(np.asarray(self.vals)),
            ucols=np.concatenate(
                [np.asarray(self.ucols),
                 np.zeros((pad, CG), np.int32)]
            ),
            tile_of=np.concatenate(
                [np.asarray(self.tile_of),
                 np.full(pad, self.n_tiles - 1, np.int32)]
            ),
            first=np.concatenate(
                [np.asarray(self.first), np.zeros(pad, np.int32)]
            ),
            vals_b=None if self.vals_b is None else _padv(
                np.asarray(self.vals_b)
            ),
            n=self.n,
            n_tiles=self.n_tiles,
            b=self.b,
            cl=self.cl,
            n_cols=self.n_cols,
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
        nc = self.n if self.n_cols is None else self.n_cols
        if not rows:
            return sp.csr_matrix((self.n, nc))
        coo_r = np.repeat(
            np.asarray(rows) * b, b * b
        ) + np.tile(np.repeat(np.arange(b), b), len(rows))
        coo_c = np.repeat(
            np.asarray(cols) * b, b * b
        ) + np.tile(np.tile(np.arange(b), b), len(rows))
        out = sp.coo_matrix(
            (np.asarray(blocks).ravel(), (coo_r, coo_c)),
            shape=(n_pad, self.n_cols_padded),
        ).tocsr()
        return out[: self.n, :nc].tocsr()

    # ------------------------------------------------------------------
    def banded(self, m: int, budget_bytes: int = 10 * 1024 * 1024):
        """Row-band split whose contiguous X windows fit the VMEM budget
        at block width m (same plan as BELLPairs.banded — VERDICT item 2)."""
        if self.n_cols is not None:
            raise ValueError("banded() supports square layouts only")
        b = self.b
        tile_of = np.asarray(self.tile_of)
        ucols = np.asarray(self.ucols)
        cmin_t = np.full(self.n_tiles, np.iinfo(np.int64).max)
        cmax_t = np.zeros(self.n_tiles, dtype=np.int64)
        np.minimum.at(cmin_t, tile_of, ucols.min(axis=1))
        np.maximum.at(cmax_t, tile_of, ucols.max(axis=1) + 1)
        # from_csr gives every tile >= 1 chunk, but guard hand-built
        # layouts whose tile never appears in tile_of: clamp to a
        # degenerate valid window (round-2 advisor finding, low)
        unset = cmin_t > cmax_t
        cmin_t = np.where(unset, 0, cmin_t)
        cmax_t = np.where(unset, 1, cmax_t)
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
