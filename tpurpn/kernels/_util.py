"""Shared helpers for the Pallas kernel modules.

(tpurpn.boxes keeps its own copy of round_up: boxes is imported by the
kernels' callers and importing it here would be circular.)
"""


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
