"""Fetch-verified training-step breakdown on the current backend.

Times each segment of the training step separately — masking/preprocess,
forward, forward+backward, optimizer update, full step — using the only
reliable barrier on this platform (a host value fetch) with the work
bundled inside ``lax.scan`` (per-iteration key variation prevents XLA from
hoisting loop-invariant work; see CLAUDE.md "TRUST NOTHING WITHOUT A VALUE
FETCH").

Usage:
    python tools/profile_step.py [--batch-size 256] [--latent-dim 256]
        [--num-blocks 4] [--dtype bfloat16] [--remat] [--iters 30]

Prints one JSON line with ms-per-iteration per segment.
"""

from __future__ import annotations

# Repo-root bootstrap so `python tools/profile_step.py` works without pip install.
if __package__ in (None, ""):
    # Inline (not `import _bootstrap`): the bare-name import relies on the
    # interpreter prepending the script dir to sys.path, which -P /
    # PYTHONSAFEPATH disable and a stray _bootstrap.py could shadow.
    import os as _os
    import sys as _sys

    _repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    if _repo not in _sys.path:
        _sys.path.insert(0, _repo)
else:
    from . import _bootstrap  # noqa: F401

import argparse
import json
import time


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--latent-dim", type=int, default=256)
    parser.add_argument("--num-blocks", type=int, default=4)
    parser.add_argument("--dtype", default=None)
    parser.add_argument("--remat", action="store_true")
    parser.add_argument("--attention-impl", default="auto")
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--fine", action="store_true",
                        help="also time encoder/blocks/decoder/loss "
                             "individually (5 extra compiles)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from flexdm_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from flexdm_tpu.data import split_device_batch, synthetic
    from flexdm_tpu.models import MFPModel, forward_train, make_task_config
    from flexdm_tpu.models.masking import preprocess_for_train, sample_tasks
    from flexdm_tpu.train import TrainState, init_params, make_optimizer
    from flexdm_tpu.train.optim import l2_penalty

    B = args.batch_size
    spec = synthetic.cached_spec("crello", B)
    schema = spec.schema

    model = MFPModel(
        schema, latent_dim=args.latent_dim, num_blocks=args.num_blocks,
        attention_impl=args.attention_impl, dtype=args.dtype,
        remat=args.remat,
    )
    loader = spec.make_dataset("train", batch_size=B, shuffle=True,
                               repeat=True, drop_remainder=True)
    batch = {
        k: jnp.asarray(v)
        for k, v in split_device_batch(next(iter(loader))).items()
    }
    params = init_params(model, batch, seed=0)
    tx = make_optimizer(1e-4)
    state = TrainState(
        params=params, opt_state=tx.init(params), step=jnp.asarray(0)
    )
    tc = make_task_config(schema, "elem_pos_attr_img_txt")

    def timed(fn, *fn_args):
        """ms/iter of fn bundled in a scan with per-iteration key variation.

        The scan carry ACCUMULATES the segment's result — a `*0` trick gets
        algebraically simplified and the whole segment dead-code-eliminated
        (observed: a "0.8 ms" full step).  The key is folded with the carry
        so no iteration's work can be hoisted out of the loop.
        """
        def many(*a):
            def body(carry, i):
                key = jax.random.fold_in(
                    jax.random.PRNGKey(0), i + carry.astype(jnp.int32)
                )
                out = fn(key, *a)
                return carry + out.astype(jnp.float32) * 1e-6, None

            c, _ = jax.lax.scan(
                body, jnp.float32(0), jnp.arange(args.iters)
            )
            return c

        m = jax.jit(many)
        float(m(*fn_args))  # compile + warm
        t0 = time.perf_counter()
        float(m(*fn_args))
        return round(1000 * (time.perf_counter() - t0) / args.iters, 3)

    # Segment: masking/preprocess only (task sampling + 5-way mask mux).
    # fast_rng=True matches the production train path (forward_train draws
    # replacement bits from the hardware rbg when train=True); the default
    # threefry path costs ~2 ms more at B=256 and is NOT what the full
    # step runs.
    def seg_masking(key, batch):
        tasks = sample_tasks(key, B, tc.task_probs)
        targets, modified, masks = preprocess_for_train(
            batch, schema, tasks, key, fast_rng=True
        )
        return sum(jnp.sum(m.astype(jnp.float32)) for m in masks.values())

    # Segment: forward (loss value only).
    def seg_forward(key, state, batch):
        loss, _ = forward_train(model, state.params, batch, key, tc)
        return loss

    # Segment: forward + backward (grads reduced to one scalar).
    def seg_grad(key, state, batch):
        def loss_fn(p):
            loss, _ = forward_train(model, p, batch, key, tc)
            return loss + 1e-2 * l2_penalty(p)

        g = jax.grad(loss_fn)(state.params)
        return sum(
            jnp.sum(x.astype(jnp.float32)[..., :1])
            for x in jax.tree.leaves(g)
        )

    # Segment: optimizer only (clipnorm + Adam on fixed grads).
    grads = jax.jit(jax.grad(
        lambda p: forward_train(
            model, p, batch, jax.random.PRNGKey(0), tc
        )[0]
    ))(state.params)

    def seg_opt(key, state, grads):
        # fold the key in so the scan cannot hoist the update; the noise
        # must be NONZERO — a `* 0` gets algebraically simplified and the
        # whole segment dead-code-eliminated (see timed()'s docstring)
        g = jax.tree.map(
            lambda x: x + jax.random.uniform(key, (), x.dtype) * 1e-30,
            grads,
        )
        updates, _ = tx.update(g, state.opt_state, state.params)
        leaves = jax.tree.leaves(updates)
        return sum(jnp.sum(x.astype(jnp.float32)[..., :1]) for x in leaves)

    fine = {}
    if args.fine:
        # Fine-grained forward breakdown: time the model and each stage on
        # FIXED preprocessed inputs (masking excluded).  Per-iteration
        # dropout keys keep every iteration's work live in the scan.
        from flexdm_tpu.models.encoder import Encoder
        from flexdm_tpu.models.decoder import Decoder
        from flexdm_tpu.models.losses import compute_mfp_loss
        from flexdm_tpu.models.transformer import Blocks

        # Everything array-sized below is PASSED as a jit argument, never
        # closed over: captured constants are serialized into the HLO,
        # which on this platform's remote-compile transport hard-fails
        # past ~200 MB (observed HTTP 413; see CLAUDE.md / gather_batch).
        tasks0 = sample_tasks(jax.random.PRNGKey(1), B, tc.task_probs)
        targets0, modified0, masks0 = jax.jit(
            lambda b, k: preprocess_for_train(b, schema, tasks0, k)
        )(batch, jax.random.PRNGKey(2))

        def seg_model(key, state, modified0):
            out = model.apply(
                state.params, modified0, False, rngs={"dropout": key}
            )
            return sum(
                jnp.sum(v.astype(jnp.float32)[..., :1]) for v in out.values()
            )

        enc = Encoder(
            schema, latent_dim=args.latent_dim, fusion="add",
            dropout=0.1, dtype=args.dtype, name="encoder",
        )
        blocks = Blocks(
            latent_dim=args.latent_dim, num_blocks=args.num_blocks,
            block_type="deepsvg", num_heads=8, dropout=0.1,
            attention_impl=args.attention_impl, dtype=args.dtype,
            remat=args.remat, name="blocks",
        )
        dec = Decoder(schema, latent_dim=args.latent_dim, name="decoder",
                      dtype=args.dtype)
        p = state.params["params"]
        enc_p, blocks_p, dec_p = (
            {"params": p["encoder"]}, {"params": p["blocks"]},
            {"params": p["decoder"]},
        )
        seq0, seq_mask0 = jax.jit(
            lambda p, m, k: enc.apply(p, m, True, rngs={"dropout": k})
        )(enc_p, modified0, jax.random.PRNGKey(3))

        def seg_encoder(key, enc_p, modified0):
            s, _m = enc.apply(enc_p, modified0, False, rngs={"dropout": key})
            return jnp.sum(s.astype(jnp.float32)[..., :1])

        def seg_blocks(key, blocks_p, seq0, seq_mask0):
            h = blocks.apply(
                blocks_p,
                seq0 + jax.random.uniform(key, (), seq0.dtype) * 1e-30,
                seq_mask0, deterministic=False, rngs={"dropout": key},
            )
            return jnp.sum(h.astype(jnp.float32)[..., :1])

        h0 = jax.jit(
            lambda p, s, m: blocks.apply(p, s, m, deterministic=True)
        )(blocks_p, seq0, seq_mask0)
        outputs0 = jax.jit(
            lambda p, m: model.apply(p, m, True)
        )(state.params, modified0)

        def seg_decoder(key, dec_p, h0):
            out = dec.apply(
                dec_p, h0 + jax.random.uniform(key, (), h0.dtype) * 1e-30,
                False, rngs={"dropout": key},
            )
            return sum(
                jnp.sum(v.astype(jnp.float32)[..., :1]) for v in out.values()
            )

        def seg_loss(key, targets0, outputs0, masks0):
            # eps in each output's OWN dtype: a float32 eps would promote
            # bf16 logits and time an all-f32 loss under --dtype bfloat16.
            eps = jax.random.uniform(key, (), jnp.float32) * 1e-30
            out = {
                k2: v + eps.astype(v.dtype) for k2, v in outputs0.items()
            }
            loss, _m = compute_mfp_loss(schema, targets0, out, masks0)
            return loss

        fine = {
            "model_fwd_ms": timed(seg_model, state, modified0),
            "encoder_ms": timed(seg_encoder, enc_p, modified0),
            "blocks_ms": timed(seg_blocks, blocks_p, seq0, seq_mask0),
            "decoder_ms": timed(seg_decoder, dec_p, h0),
            "loss_ms": timed(seg_loss, targets0, outputs0, masks0),
        }

    # Full step: the state must be CARRIED through the scan (as the trainer
    # does) — returning only the loss would let XLA drop the whole update.
    from flexdm_tpu.train import make_train_step

    base_step = make_train_step(model, tc, tx, l2=1e-2)

    def timed_full():
        def many(state, batch):
            # base_step folds state.step into the key internally and the
            # carried step increments every iteration, so no iteration's
            # RNG-dependent work is loop-invariant — a fixed base key is
            # exactly what the trainer's epoch scan passes.
            def body(st, i):
                st2, metrics = base_step(st, batch, jax.random.PRNGKey(0))
                return st2, None

            st, _ = jax.lax.scan(body, state, jnp.arange(args.iters - 1))
            _, metrics = base_step(st, batch, jax.random.PRNGKey(0))
            return metrics["loss"]

        m = jax.jit(many)
        float(m(state, batch))
        t0 = time.perf_counter()
        float(m(state, batch))
        return round(1000 * (time.perf_counter() - t0) / args.iters, 3)

    out = {
        "config": {
            "batch_size": B, "latent_dim": args.latent_dim,
            "num_blocks": args.num_blocks, "dtype": args.dtype,
            "remat": args.remat, "backend": jax.default_backend(),
        },
        "masking_ms": timed(seg_masking, batch),
        "forward_ms": timed(seg_forward, state, batch),
        "forward_backward_ms": timed(seg_grad, state, batch),
        "optimizer_ms": timed(seg_opt, state, grads),
        **fine,
        "full_step_ms": timed_full(),
    }
    out["steps_per_sec"] = round(1000.0 / out["full_step_ms"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
