"""Measured ablations of the flagship step's non-matmul residue (VERDICT r3 #5).

Times the FULL production train step (fwd+bwd+clipnorm+Adam+L2, scan-bundled,
fetch-barriered) under targeted variants of the masking/draw pipeline:

* ``base``        — production step as shipped.
* ``hoist``       — the fused (B,3,n_seq,S) mask draw precomputed for ALL
                    scan iterations in one bulk threefry call, consumed as
                    scan xs (experiment (a)).
* ``hoist_rbg``   — same hoist, bulk draw through the hardware rbg.
* ``rbg_step``    — per-step draw through the hardware rbg (train path only;
                    mask positions would no longer be threefry).
* ``bf16_draws``  — per-step threefry draw generated in bfloat16, so the
                    compare chain (select/change/replace) runs in bf16
                    (experiment (c)).
* ``no_null``     — filter_padding's null-writes removed entirely (semantic
                    UPPER BOUND for experiment (b): if this is ~0, folding
                    the null-writes anywhere cannot help).
* ``no_masking``  — preprocess_for_train replaced by fixed precomputed
                    (targets, modified, masks): upper bound for the whole
                    masking stage inside the fused step.

Usage: python tools/ablate_residue.py [--dtype bfloat16] [--iters 30]
Prints one JSON line: {variant: ms_per_step}.
"""

if __package__ in (None, ""):
    import os as _os
    import sys as _sys

    _repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    if _repo not in _sys.path:
        _sys.path.insert(0, _repo)

import argparse
import json
import time


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--latent-dim", type=int, default=256)
    parser.add_argument("--num-blocks", type=int, default=4)
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument(
        "--variants", default=None,
        help="comma-separated subset (default: all)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from flexdm_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from flexdm_tpu.data import split_device_batch, synthetic
    from flexdm_tpu.models import MFPModel, forward_train, make_task_config
    from flexdm_tpu.models import masking as M
    from flexdm_tpu.train import TrainState, init_params, make_optimizer
    from flexdm_tpu.train.optim import l2_penalty
    from flexdm_tpu.ops import rng as fast

    B = args.batch_size
    spec = synthetic.cached_spec("crello", B)
    schema = spec.schema
    dtype = None if args.dtype in (None, "", "float32") else args.dtype

    model = MFPModel(
        schema, latent_dim=args.latent_dim, num_blocks=args.num_blocks,
        dtype=dtype,
    )
    loader = spec.make_dataset("train", batch_size=B, shuffle=True,
                               repeat=True, drop_remainder=True)
    batch = {
        k: jnp.asarray(v)
        for k, v in split_device_batch(next(iter(loader))).items()
    }
    params = init_params(model, batch, seed=0)
    tx = make_optimizer(1e-4)
    state0 = TrainState(
        params=params, opt_state=tx.init(params), step=jnp.asarray(0)
    )
    tc = make_task_config(schema, "elem_pos_attr_img_txt")
    draw_shape = M.train_draw_shape(schema, B)

    def step_with(draws_fn=None):
        """Production-equivalent step; draws_fn(key) -> mask_draws or None."""
        def train_step(state, batch, base_key, xs_draws=None):
            key = jax.random.fold_in(base_key, state.step)
            mask_draws = xs_draws
            if mask_draws is None and draws_fn is not None:
                mask_draws = draws_fn(jax.random.fold_in(key, 7))

            def loss_fn(p):
                loss, metrics = forward_train(
                    model, p, batch, key, tc, train=True,
                    mask_draws=mask_draws,
                )
                loss = loss + 1e-2 * l2_penalty(p)
                return loss, dict(metrics, loss=loss)

            import optax
            grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            p = optax.apply_updates(state.params, updates)
            return TrainState(params=p, opt_state=opt_state,
                              step=state.step + 1), metrics

        return train_step

    def timed_scan(base_step, hoist=None):
        """ms/step of iters steps bundled in one scan, value-fetch barriered.

        ``hoist``: None, or a callable key->bulk (T, *draw_shape) tensor
        consumed stepwise as scan xs.
        """
        def many(state, batch):
            if hoist is not None:
                xs = hoist(jax.random.PRNGKey(42))
                def body(st, dr):
                    st2, m = base_step(st, batch, jax.random.PRNGKey(0), dr)
                    return st2, None
                state, _ = jax.lax.scan(body, state, xs[:-1])
                _, metrics = base_step(
                    state, batch, jax.random.PRNGKey(0), xs[-1]
                )
            else:
                def body(st, i):
                    st2, m = base_step(st, batch, jax.random.PRNGKey(0))
                    return st2, None
                state, _ = jax.lax.scan(
                    body, state, jnp.arange(args.iters - 1)
                )
                _, metrics = base_step(state, batch, jax.random.PRNGKey(0))
            return metrics["loss"]

        m = jax.jit(many)
        float(m(state0, batch))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(m(state0, batch))
            best = min(best, time.perf_counter() - t0)
        return round(1000 * best / args.iters, 3)

    variants = {}

    def want(name):
        return args.variants is None or name in args.variants.split(",")

    if want("base"):
        variants["base"] = timed_scan(step_with())
    if want("hoist"):
        variants["hoist"] = timed_scan(
            step_with(),
            hoist=lambda k: jax.random.uniform(
                k, (args.iters,) + draw_shape
            ),
        )
    if want("hoist_rbg"):
        variants["hoist_rbg"] = timed_scan(
            step_with(),
            hoist=lambda k: fast.uniform(k, (args.iters,) + draw_shape),
        )
    if want("rbg_step"):
        variants["rbg_step"] = timed_scan(
            step_with(draws_fn=lambda k: fast.uniform(k, draw_shape))
        )
    if want("bf16_draws"):
        variants["bf16_draws"] = timed_scan(
            step_with(draws_fn=lambda k: jax.random.uniform(
                k, draw_shape, jnp.bfloat16
            ))
        )
    if want("no_null"):
        real_filter = M.filter_padding
        M.filter_padding = lambda inputs, schema_, seq_mask: {
            c.name: inputs[c.name] for c in schema_.modeled
        }
        try:
            variants["no_null"] = timed_scan(step_with())
        finally:
            M.filter_padding = real_filter
    if want("no_masking"):
        # Fixed precomputed (targets, modified, masks): the step runs only
        # fwd+bwd+opt on already-masked inputs.
        from flexdm_tpu.models.mfp import apply_model
        from flexdm_tpu.models.losses import compute_mfp_loss

        tasks0 = M.sample_tasks(jax.random.PRNGKey(1), B, tc.task_probs)
        targets0, modified0, masks0 = jax.jit(
            lambda b, k: M.preprocess_for_train(b, schema, tasks0, k)
        )(batch, jax.random.PRNGKey(2))

        def nm_step(state, batch_, base_key, xs_draws=None):
            key = jax.random.fold_in(base_key, state.step)

            def loss_fn(p):
                out, _ = apply_model(
                    model, p, modified0, targets0, masks0,
                    deterministic=False,
                    rngs={"dropout": key, "noise": key, "vae": key},
                )
                loss, metrics = compute_mfp_loss(
                    schema, targets0, out, masks0
                )
                loss = loss + 1e-2 * l2_penalty(p)
                return loss, dict(metrics, loss=loss)

            import optax
            grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            p = optax.apply_updates(state.params, updates)
            return TrainState(params=p, opt_state=opt_state,
                              step=state.step + 1), metrics

        variants["no_masking"] = timed_scan(nm_step)

    out = {
        "config": {"batch_size": B, "latent_dim": args.latent_dim,
                   "num_blocks": args.num_blocks, "dtype": args.dtype,
                   "backend": jax.default_backend(), "iters": args.iters},
        "ms_per_step": variants,
        "steps_per_sec": {k: round(1000.0 / v, 1)
                          for k, v in variants.items()},
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
