"""Eigensolvers: Lanczos (plain + shift-invert) and LOBPCG, written once as
jit-ed SPMD loops over an abstract operator (SURVEY.md §2 C9/C10/C11, §7.4
rule 1: device count is a mesh property, not a code path).
"""

from maxwell_tpu.solvers.results import EigenResult  # noqa: F401
from maxwell_tpu.solvers.operator import Pencil  # noqa: F401
from maxwell_tpu.solvers.lanczos import lanczos  # noqa: F401
from maxwell_tpu.solvers.lobpcg import lobpcg  # noqa: F401
