"""Device-mesh construction and sharding helpers.

The reference is single-process, single-device (SURVEY.md #2.2: no DP/TP/PP,
no communication backend; its ``cores`` knob is dead code). The TPU-native
build's communication layer is a ``jax.sharding.Mesh`` with axes
``(chains, data)``:

* ``chains`` — independent HMC chains, one chain group per device; purely
  embarrassing parallelism laid out so no collective ever crosses it.
* ``data``  — the training batch for the full-data likelihood, sharded so
  the log-likelihood and its gradient are ``psum``'d over the ICI inside the
  leapfrog loop (the 1M-point surrogate config in BASELINE.json).

Parameter sharding (TP/PP/SP/EP) is deliberately absent: the model family is
small MLPs that always fit one core's HBM (SURVEY.md #2.2 records this
decision).

Multi-slice / DCN scope decision (SURVEY.md #2.2 "optional multi-slice over
DCN"): **single-slice ICI only.** The largest config in BASELINE.json (the
1M-point surrogate) fits comfortably in one v5e slice — 1M rows x 19 f32
features is ~76MB, and the per-leapfrog collective is one (scalar, D)-sized
psum — so crossing DCN would add latency without relieving any resource.
If a future dataset exceeds one slice's aggregate HBM, the extension is
mechanical: build the mesh from ``jax.devices()`` spanning slices and put
the ``data`` axis on the DCN dimension (chains stay intra-slice so the
per-step psum rides the ICI); nothing in the sampler changes because all
communication is expressed through this mesh.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CHAIN_AXIS = "chains"
DATA_AXIS = "data"


def make_mesh(n_chain_devices: Optional[int] = None,
              n_data_devices: Optional[int] = None,
              devices=None) -> Mesh:
    """Builds a ``(chains, data)`` mesh over the available devices.

    Defaults put every device on the chain axis (the right layout when the
    dataset fits one chip); pass ``n_data_devices`` to trade chain-axis width
    for data-parallel likelihood bandwidth.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_chain_devices is None and n_data_devices is None:
        n_chain_devices, n_data_devices = n, 1
    elif n_chain_devices is None:
        n_chain_devices = n // n_data_devices
    elif n_data_devices is None:
        n_data_devices = n // n_chain_devices
    if n_chain_devices * n_data_devices != n:
        raise ValueError(
            f"mesh {n_chain_devices}x{n_data_devices} != {n} devices")
    arr = np.asarray(devices).reshape(n_chain_devices, n_data_devices)
    return Mesh(arr, (CHAIN_AXIS, DATA_AXIS))


def chain_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis = chains, everything else replicated."""
    return NamedSharding(mesh, P(CHAIN_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis = data batch."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: np.ndarray, multiple: int,
                    axis: int = 0) -> Tuple[np.ndarray, int]:
    """Zero-pads ``x`` along ``axis`` to a multiple; returns (padded, n_pad).

    Likelihood shards must divide evenly; padding rows are masked out by the
    caller (weight-zero likelihood contribution).
    """
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, 0
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (0, rem)
    return np.pad(x, pad_width), rem
