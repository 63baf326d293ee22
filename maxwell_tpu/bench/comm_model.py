"""Analytic ICI/DCN communication model for the distributed LOBPCG
iteration (round-3 VERDICT weak item 6: the >=70% multi-host weak-scaling
gate is unprovable on this one-chip environment — this model PREDICTS it
from measured single-chip compute plus parameterized link bandwidths, and
names the dominant comm term so a real-pod run knows where to look).

Per-iteration communication of the slab-sharded stencil LOBPCG
(solvers/dist_solve + dist/stencil_dist + solvers/spectral):

1. HALO exchange: two x-interface plane sets per KM apply, ~A_face =
   (2*ny*nz + ny + nz) edges per plane-pair boundary, m columns, 4 B.
   Point-to-point over one neighbor link; the DCN-aware schedule
   (dist/partition.exchange_halos) overlaps it with the interior apply.
2. SMALL psums: Gram/RR reductions — O((3m)^2) floats, latency-bound,
   negligible volume.
3. SPECTRAL preconditioner psum: the distributed exact solve psums the
   FULL mode-coefficient volume, ~3 * n_modes * m floats with n_modes ~
   nx*ny*nz per component lattice (dist/stencil_dist mode grids) — by far
   the largest comm term. Ring allreduce cost: 2*(D-1)/D * V / BW over
   the SLOWEST link in the ring (DCN once the mesh spans hosts).

Bandwidth defaults are order-of-magnitude public numbers for v5e-class
parts (ICI ~4.5e10 B/s per link direction, DCN ~2.5e10 B/s per host
pair); pass measured values when available.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class CommModel:
    ny: int
    nz: int
    cells: int  # x-cells per shard (weak scaling keeps this constant)
    m: int  # LOBPCG block width
    t_compute_iter_s: float  # measured single-chip per-iteration compute
    applies_per_iter: float = 2.0  # KM on W + projector mass applies
    bw_ici: float = 4.5e10  # B/s per neighbor link direction
    bw_dcn: float = 2.5e10  # B/s per host-crossing link
    overlap_halo: float = 1.0  # fraction of halo time hidden (measured
    # structure: interior apply has no dataflow edge to the exchange)

    def halo_bytes(self) -> int:
        a_face = 2 * self.ny * self.nz + self.ny + self.nz
        return int(2 * a_face * self.m * 4 * self.applies_per_iter)

    def spectral_psum_bytes(self, D: int) -> int:
        nx = self.cells * D
        n_modes = 3 * nx * self.ny * self.nz
        return int(n_modes * self.m * 4)

    def t_iter(self, D: int, hosts: int = 1) -> dict:
        """Predicted per-iteration time decomposition at D shards."""
        if D == 1:
            return {
                "compute": self.t_compute_iter_s, "halo": 0.0,
                "allreduce": 0.0, "total": self.t_compute_iter_s,
            }
        link = self.bw_dcn if hosts > 1 else self.bw_ici
        t_halo = self.halo_bytes() / link * (1.0 - self.overlap_halo)
        # ring allreduce of the replicated mode volume; weak scaling
        # grows the volume with D, the per-link share is 2(D-1)/D * V/D
        # ... for an all-to-one-to-all (psum of per-shard partial sums of
        # the FULL grid) each link carries ~2*V*(D-1)/D
        V = self.spectral_psum_bytes(D)
        t_ar = 2.0 * V * (D - 1) / D / link
        total = self.t_compute_iter_s + t_halo + t_ar
        return {
            "compute": self.t_compute_iter_s, "halo": t_halo,
            "allreduce": t_ar, "total": total,
        }

    def weak_efficiency(self, D: int, hosts: int = 1) -> float:
        """t(1 shard)/t(D shards) at constant per-shard work."""
        return self.t_compute_iter_s / self.t_iter(D, hosts)["total"]

    def report(self, sizes=(1, 2, 4, 8), hosts_of=None) -> list[dict]:
        """Rows for BASELINE.md: predicted efficiency + dominant term."""
        rows = []
        for D in sizes:
            h = hosts_of(D) if hosts_of else (1 if D <= 4 else D // 4)
            t = self.t_iter(D, h)
            dom = max(("halo", "allreduce"), key=lambda k: t[k])
            rows.append({
                "devices": D,
                "hosts": h,
                "predicted_efficiency": self.t_compute_iter_s / t["total"],
                "t_iter_ms": t["total"] * 1e3,
                "comm_fraction": 1.0 - t["compute"] / t["total"],
                "dominant_comm": dom if t[dom] > 0 else "none",
            })
        return rows
