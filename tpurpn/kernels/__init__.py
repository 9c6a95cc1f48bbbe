"""Pallas TPU kernels for the RPN hot ops (SURVEY.md §2 "native code" table).

Each kernel has a pure-jnp twin in tpurpn.boxes / tpurpn.target used as its
A/B correctness oracle; the kernels are drop-in replacements behind the same
function signatures.
"""

from .nms_pallas import nms_pallas_keep

__all__ = ["nms_pallas_keep"]
