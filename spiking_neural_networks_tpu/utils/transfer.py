"""Host->device state transfer that survives the axon relay.

Shipping a ~45-leaf state pytree as individual device_puts (or as one big
batched device_put) intermittently poisons buffers on the tunneled TPU
backend (ResourceExhausted surfacing at first use).  This module packs the
whole state into TWO flat host buffers (one f32 carrying float and bool
fields, one i32) — two transfers — and unpacks them on device with a single
jitted slice/reshape/cast program, compiled once per state layout.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _build_unpack(meta):
    """meta: tuple of (key, shape, kind) with kind in {'f', 'b', 'i'}."""

    def unpack(fbuf, ibuf):
        out = {}
        foff = ioff = 0
        for key, shape, kind in meta:
            size = int(np.prod(shape)) if shape else 1
            if kind == "i":
                arr = jax.lax.dynamic_slice(ibuf, (ioff,), (size,))
                ioff += size
                out[key] = arr.reshape(shape)
            else:
                arr = jax.lax.dynamic_slice(fbuf, (foff,), (size,))
                foff += size
                val = arr.reshape(shape)
                out[key] = val != 0 if kind == "b" else val
        return out

    return jax.jit(unpack)


def device_put_state(state):
    """Transfer a dict of host arrays to device, one synced leaf at a time.

    Empirically the only reliable pattern on the tunneled backend: batched
    multi-leaf device_put poisons the session at >=256x256 state sizes, and
    a packed two-buffer + unpack-program scheme left output buffers whose
    D2H hangs.  Sequential synced transfers cost ~1 RTT per field at
    populate time only; simulation never re-transfers."""
    out = {}
    for key in sorted(state):
        a = np.asarray(state[key])
        if a.dtype == np.bool_:
            out[key] = device_put_bool(a)
        else:
            out[key] = jax.device_put(a)
        out[key].block_until_ready()
    return out


def device_put_bool(a):
    """Bool arrays transferred as uint8 then cast on device (direct bool
    device_put is unreliable over the relay)."""
    a = np.asarray(a)
    return _cast_bool(jax.device_put(a.astype(np.uint8)))


@jax.jit
def _cast_bool(x):
    return x != 0
