"""TPU-fast random draws for the training hot path.

JAX's default threefry generator costs ~20 ALU ops per 32-bit word; at the
flagship step's sizes that is real money — the eight transformer dropout
masks plus the masking layer's random-replacement tensors (two
``(B, S, 512)`` normals per step for the crello embedding columns) measured
~2 ms of a ~10 ms step.  XLA's hardware ``RngBitGenerator`` path (the
``"rbg"`` key implementation) generates the same streams-of-bits contract at
near-memory speed: the key arriving at the call site is an ordinary threefry
key (cheap to split/fold, well-mixed), and only the final array draw converts
it to an rbg key.

Scope: these helpers back **dropout** (``FastDropout``) and the **train-path
random-replacement draws** (``apply_token(..., fast_rng=True)``, r3) —
neither influences validation or evaluation scores (dropout is off outside
training; train batches are full fixed-size so no batch-padding contract
applies).  Mask *positions* and every validation-path draw deliberately stay
on threefry: rbg bits are NOT positionally stable across array shapes on TPU
(measured — the value at ``[i, ...]`` of a ``(B, ...)`` draw changes with
``B``), which would break the exact batch-size invariance of validation
scores that threefry's counter-based layout provides.

Determinism within one environment is unchanged — rbg draws are a pure
function of the key for a fixed backend and XLA version — so same-seed
training trajectories stay bit-identical on the machine that produced them
(tests ``tests/test_reproducibility.py``).  The rbg stream is documented by
JAX as backend/compiler-version dependent: do not expect identical draws
across CPU vs TPU or across XLA upgrades.  Statistical contracts
(uniformity, Bernoulli rates, normal moments) are identical; only the
concrete stream differs from threefry, which carries no parity burden: the
reference used TF's own generator anyway (reference
``src/mfp/mfp/train.py:19-23`` seeds a different RNG family altogether).

``FastDropout`` is a drop-in for ``flax.linen.Dropout`` (same ``rate`` /
``deterministic`` / ``"dropout"`` rng-collection contract, no broadcast
dims) drawing its keep mask through this path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def rbg_key(key: jax.Array) -> jax.Array:
    """Convert a threefry key into a 128-bit ``rbg`` key.

    The four key words come from two threefry splits so the full rbg key
    space is exercised (not a duplicated 64-bit half).
    """
    data = jax.random.key_data(jax.random.split(key, 2)).reshape(4)
    return jax.random.wrap_key_data(data, impl="rbg")


def uniform(
    key: jax.Array,
    shape: Sequence[int],
    dtype=jnp.float32,
    minval=0.0,
    maxval=1.0,
) -> jnp.ndarray:
    return jax.random.uniform(rbg_key(key), shape, dtype, minval, maxval)


def normal(key: jax.Array, shape: Sequence[int], dtype=jnp.float32):
    return jax.random.normal(rbg_key(key), shape, dtype)


def bernoulli(key: jax.Array, p, shape: Sequence[int]) -> jnp.ndarray:
    return jax.random.bernoulli(rbg_key(key), p, shape)


def randint(
    key: jax.Array, shape: Sequence[int], minval, maxval, dtype=jnp.int32
) -> jnp.ndarray:
    return jax.random.randint(rbg_key(key), shape, minval, maxval, dtype)


class FastDropout(nn.Module):
    """``nn.Dropout`` semantics with the keep mask drawn via :func:`rbg_key`.

    Inverted dropout, identical to flax: keep with probability ``1 - rate``
    and scale survivors by ``1 / (1 - rate)``.
    """

    rate: float

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: Optional[bool] = None
    ) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        if self.rate == 1.0:
            return jnp.zeros_like(x)
        keep = 1.0 - self.rate
        mask = bernoulli(self.make_rng("dropout"), keep, x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))
