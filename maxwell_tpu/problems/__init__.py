"""Problem definitions: cavity geometries, edge-element discretizations,
assembly of the curl-curl stiffness K and mass M, and analytic mode oracles.

Host-side, runs once per problem; not performance-critical (SURVEY.md §2 C1/C2).
"""

from maxwell_tpu.problems.cavity2d import RectCavity2D  # noqa: F401
from maxwell_tpu.problems.cavity3d import BrickCavity3D  # noqa: F401
from maxwell_tpu.problems.analytic import (  # noqa: F401
    te_eigenvalues_2d,
    cavity_eigenvalues_3d,
)
