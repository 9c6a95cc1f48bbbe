"""Pallas TPU kernels for the RPN hot ops (SURVEY.md §2 "native code" table).

Each kernel has a pure-jnp oracle it is A/B'd against: the NMS and fused
proposal kernels against tpurpn.boxes._nms_keep_sorted_batched via the
use_pallas=False predict pipeline, the target kernels against
tpurpn.target's jnp implementations (same rand bits, bit-equal), and the
IR-stage kernel against the folded-BN flax forward (the one kernel whose
oracle is the model itself, per CLAUDE.md). The kernels are drop-in
replacements behind the same function signatures.
"""

from .nms_pallas import nms_pallas_keep

__all__ = ["nms_pallas_keep"]
