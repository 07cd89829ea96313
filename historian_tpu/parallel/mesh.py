"""Device-mesh helpers for multi-chip scaling.

The framework's parallel axes (SURVEY.md section 2.7):
- dp: data parallel -- datasets / alignment columns / pairwise DP jobs
- ep: expert parallel -- mixture components / discretized-gamma bins
  (independent rate matrices shard naturally)
- sp: sequence parallel -- anti-diagonal wavefront tiles of the DP band
- tp: tensor parallel -- alphabet x alphabet tiles of emission einsums
- pp: pipeline parallel -- postorder tree levels

Round 1 wires dp and ep end-to-end (EM count accumulation reduced with
psum -- the in-memory analogue of the reference's count/sum file
MapReduce, README.md:201-208); sp/tp/pp land with the wavefront kernels.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, ep: int = 1) -> Mesh:
    """1- or 2-axis mesh (dp[, ep]) over the first n devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.array(devices[:n_devices])
    if ep > 1:
        if n_devices % ep:
            raise ValueError(f"n_devices {n_devices} not divisible by ep {ep}")
        return Mesh(devices.reshape(n_devices // ep, ep), ("dp", "ep"))
    return Mesh(devices.reshape(n_devices, 1), ("dp", "ep"))


def dp_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over dp."""
    return NamedSharding(mesh, P("dp"))


def ep_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over ep (mixture components)."""
    return NamedSharding(mesh, P("ep"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
