"""Host <-> device transfer helpers.

Some TPU clients (notably the axon tunnel used in this environment) do not
implement complex64 host transfers: device_put of complex arrays is
unreliable and device->host of complex raises UNIMPLEMENTED.  These helpers
move only real float32 buffers across the PCIe/tunnel boundary and
(de)construct the complex view *on device* with a trivial jitted kernel —
which is also the faster path on hardware where complex is stored as
planar/split anyway.

Use these at every host boundary (file I/O <-> recon); inside jit complex64
works fine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("shape",))
def _combine(flat: jnp.ndarray, shape: tuple[int, ...]) -> jnp.ndarray:
    pairs = flat.reshape(shape + (2,))
    return jax.lax.complex(pairs[..., 0], pairs[..., 1])


@jax.jit
def _split(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([jnp.real(a), jnp.imag(a)], axis=-1).reshape(-1)


def to_device(x: np.ndarray) -> jax.Array:
    """numpy array -> device array (complex carried as f32 pairs in flight)."""
    x = np.asarray(x)
    if np.iscomplexobj(x):
        if x.dtype != np.complex64:
            x = x.astype(np.complex64)
        flat = np.ascontiguousarray(x).view(np.float32).reshape(-1)
        return _combine(jax.device_put(flat), x.shape)
    if x.dtype == np.float64:
        x = x.astype(np.float32)
    return jax.device_put(np.ascontiguousarray(x))


def to_host(a: jax.Array) -> np.ndarray:
    """device array -> numpy (complex leaves the device as f32 pairs)."""
    if jnp.iscomplexobj(a):
        flat = np.asarray(_split(a))
        return flat.view(np.complex64).reshape(a.shape)
    return np.asarray(a)
