"""Host <-> device transfer helpers.

Some TPU clients (notably the axon tunnel used in this environment) do not
implement complex64 host transfers: device_put of complex arrays is
unreliable and device->host of complex raises UNIMPLEMENTED.  These helpers
move real float32 planes across the boundary and (de)construct the complex
view *on device* with trivial jitted kernels.

The planes are kept as two separate (real, imag) arrays — NOT a trailing
dim-2 axis, which TPU (8,128) tiling would pad 64x in HBM (a 1 GB upload
would allocate 32 GB).

Use these at every host boundary (file I/O <-> recon); inside jit complex64
works fine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _combine(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.complex(re, im)


@jax.jit
def _split(a: jnp.ndarray):
    return jnp.real(a), jnp.imag(a)


@functools.partial(jax.jit, static_argnames=("dtype",))
def _split_cast(a: jnp.ndarray, dtype):
    return jnp.real(a).astype(dtype), jnp.imag(a).astype(dtype)


def to_device(x: np.ndarray) -> jax.Array:
    """numpy array -> device array (complex carried as two f32 planes)."""
    x = np.asarray(x)
    if np.iscomplexobj(x):
        if x.dtype != np.complex64:
            x = x.astype(np.complex64)
        re = jax.device_put(np.ascontiguousarray(x.real))
        im = jax.device_put(np.ascontiguousarray(x.imag))
        return _combine(re, im)
    if x.dtype == np.float64:
        x = x.astype(np.float32)
    return jax.device_put(np.ascontiguousarray(x))


def to_host(a: jax.Array) -> np.ndarray:
    """device array -> numpy (complex leaves the device as two f32 planes)."""
    if jnp.iscomplexobj(a):
        re, im = _split(a)
        out = np.asarray(re).astype(np.complex64)
        out.imag = np.asarray(im)
        return out
    return np.asarray(a)


def to_host_planes(a: jax.Array, dtype=np.float32) -> tuple[np.ndarray, np.ndarray]:
    """Complex device array -> (re, im) host planes cast ON DEVICE to
    ``dtype`` before the transfer.  ``dtype=float16`` halves device->host
    bytes — the readback analog of the reference's fp16 storage path
    (`src/float16.cu`), used by the streaming driver's ``--half`` readback
    (measured: tunnel D2H time scales with bytes, so f16 is ~2x)."""
    re, im = _split_cast(a, jnp.dtype(dtype))
    return np.asarray(re), np.asarray(im)
