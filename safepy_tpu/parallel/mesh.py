"""Device mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a Mesh over the available devices.

    Args:
      axes: ordered {axis_name: size}; the product must equal the device count.
        Default: all devices on a single 'perm' axis.
      devices: explicit device list (defaults to ``jax.devices()``).
    """
    if devices is None:
        devices = jax.devices()
    if axes is None:
        axes = {"perm": len(devices)}
    sizes = tuple(axes.values())
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(f"mesh axes {axes} do not cover {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(axes.keys()))
