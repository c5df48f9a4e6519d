"""Class -> color mapping.

Reproduces utils/color_utils.py:6-18 of the reference: a fixed 10-color
palette, cycling by bank ordinal — ``color(i) == PALETTE[i % 10]`` for any
bank size (the reference returns ``base_colors[:n]`` when n <= 10, else the
list repeated; indexing either result at ``i`` gives ``PALETTE[i % 10]``).
In the Spark pipeline this is a derived dimension column, not a computation.
"""

from __future__ import annotations

PALETTE: tuple[str, ...] = (
    "#1f77b4",
    "#2ca02c",
    "#ff7f0e",
    "#d62728",
    "#9467bd",
    "#8c564b",
    "#e377c2",
    "#7f7f7f",
    "#bcbd22",
    "#17becf",
)


def color_for(pattern_id: int) -> str:
    return PALETTE[pattern_id % len(PALETTE)]


def generate_distinct_colors(n: int) -> list[str]:
    """Reference-shaped helper (utils/color_utils.py:18): a list of length
    >= n whose i-th element is ``PALETTE[i % 10]``."""
    if n <= len(PALETTE):
        return list(PALETTE[:n])
    return list(PALETTE) * (n // len(PALETTE) + 1)
