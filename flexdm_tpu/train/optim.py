"""Optimizer construction matching the reference's training dynamics.

The reference compiles keras ``Adam(learning_rate, clipnorm=1.0)`` with L2
regularizers attached to every Dense kernel/bias and Embedding table
(reference ``src/mfp/mfp/train.py:71-77``,
``models/architecture/utils.py:8-22``).  keras specifics replicated here:

* ``clipnorm`` clips each gradient tensor *individually* (not the global
  norm) before Adam;
* keras Adam uses ``epsilon = 1e-7`` (optax defaults to 1e-8) AND adds it
  to the sqrt of the uncorrected second moment (``scale_by_keras_adam``);
* the L2 penalty ``l2 * sum(w^2)`` enters the loss (so it is clipped and
  adapted like any other gradient), and LayerNorm parameters are exempt.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def clip_by_per_leaf_norm(max_norm: float) -> optax.GradientTransformation:
    """keras-style ``clipnorm``: clip each gradient tensor to ``max_norm``."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g)))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
            return g * scale

        return jax.tree.map(clip, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def scale_by_keras_adam(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-7
) -> optax.GradientTransformation:
    """Adam with keras's exact epsilon placement.

    keras (legacy optimizer_v2 and tf_keras alike) computes

        alpha_t = sqrt(1 - b2^t) / (1 - b1^t)
        theta  -= lr * alpha_t * m_t / (sqrt(v_t) + eps)

    i.e. epsilon is added to the sqrt of the UNcorrected second moment,
    whereas ``optax.adam`` uses ``m_hat / (sqrt(v_hat) + eps)``.  The two
    differ by an effective epsilon factor ``1/sqrt(1 - b2^t)`` (~32x at
    t=1) — invisible for healthy gradients but it measurably shifts
    parameters with tiny gradients.  The step-for-step training golden
    (tests/test_train_golden.py) requires the keras form.  State reuses
    ``optax.ScaleByAdamState`` so checkpoints are layout-compatible.
    """

    def init_fn(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree.map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, updates
        )
        nu = jax.tree.map(
            lambda v, g: b2 * v + (1.0 - b2) * jnp.square(g),
            state.nu,
            updates,
        )
        t = count.astype(jnp.float32)
        alpha = jnp.sqrt(1.0 - b2**t) / (1.0 - b1**t)
        out = jax.tree.map(
            lambda m, v: alpha * m / (jnp.sqrt(v) + eps), mu, nu
        )
        return out, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    learning_rate: float = 1e-4,
    clipnorm: Optional[float] = 1.0,
) -> optax.GradientTransformation:
    chain = []
    if clipnorm is not None:
        chain.append(clip_by_per_leaf_norm(clipnorm))
    # Inner chain mirrors optax.adam's (ScaleByAdamState, EmptyState) state
    # tuple so opt_state checkpoints written before the keras-exact rewrite
    # still restore under --resume.
    chain.append(
        optax.chain(
            scale_by_keras_adam(b1=0.9, b2=0.999, eps=1e-7),
            optax.scale(-learning_rate),
        )
    )
    return optax.chain(*chain)


def _path_key(entry) -> Optional[str]:
    return getattr(entry, "key", None)


def l2_penalty(params) -> jnp.ndarray:
    """``sum(w^2)`` over regularized parameters.

    Matches the reference, which attaches regularizers to Dense kernels/biases
    and Embedding tables but not LayerNormalization
    (architecture/utils.py:8-22).  LayerNorm parameters are identified
    *structurally* — flax LayerNorm is the only module whose parameter set is
    ``{scale, bias}`` (Dense has ``kernel``) — rather than by module name, so
    e.g. the concat-fusion ``fusion_norm`` (encoder.py) is exempt like any
    other norm regardless of what it is called.
    """
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    norm_parents = {
        tuple(_path_key(e) for e in path[:-1])
        for path, _ in leaves
        if _path_key(path[-1]) == "scale"
    }
    kept = []
    for path, leaf in leaves:
        keys = tuple(_path_key(e) for e in path)
        if keys[:-1] in norm_parents and keys[-1] in ("scale", "bias"):
            continue
        kept.append(leaf.astype(jnp.float32).reshape(-1))
    if not kept:
        return jnp.asarray(0.0, dtype=jnp.float32)
    # One reduction over the concatenated vector instead of one tiny kernel
    # per leaf: the per-leaf form costs ~5 us of launch overhead times ~120
    # leaves (measured 0.68 ms of the 10 ms flagship step); this is one
    # copy + one reduce, and its backward is slice-views fused into the
    # 2*l2*w gradient adds.
    flat = kept[0] if len(kept) == 1 else jnp.concatenate(kept)
    return jnp.sum(jnp.square(flat))
