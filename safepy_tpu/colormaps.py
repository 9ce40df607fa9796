"""Colormap helpers for enrichment landscapes.

Reference: safepy/safe_colormaps.py — a 5-anchor piecewise-linear normalizer for the
diverging attribute maps and the hsv-derived domain palette (first color black, the
rest shuffled). The shuffle is seedable here (the reference uses the global NumPy
RNG, safe_colormaps.py:32, which makes composite plots nondeterministic).
"""

from __future__ import annotations

import matplotlib.colors as colors
import numpy as np


class MidpointRangeNormalize(colors.Normalize):
    """Piecewise-linear normalize through (vmin, mid[0], mid[1], mid[2], vmax)."""

    def __init__(self, vmin=None, vmax=None, midrange=None, clip=False):
        self.midrange = midrange
        colors.Normalize.__init__(self, vmin, vmax, clip)

    def __call__(self, value, clip=None):
        anchors = np.array([self.vmin, *self.midrange, self.vmax], dtype=float)
        quarters = np.linspace(0.0, 1.0, anchors.size)
        return np.ma.masked_invalid(np.interp(value, anchors, quarters))


def get_colors(colormap="hsv", n=10, seed=None):
    """n domain RGBA colors: black first, the rest drawn from `colormap` and
    shuffled (seedable for reproducible composite maps)."""
    import matplotlib
    cmap = matplotlib.colormaps[colormap]

    rgb = [(0, 0, 0, 1)]
    for c in np.arange(1, n):
        rgb.append(cmap(c / n))
    rgb = np.asarray(rgb)

    rng = np.random.default_rng(seed)
    rng.shuffle(rgb[1:])
    return rgb
