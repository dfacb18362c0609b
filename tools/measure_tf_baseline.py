"""Measure the reference implementation's eager-TF training step rate.

The reference trains with ``run_eagerly=True`` (reference
``src/mfp/mfp/train.py:76``), so its throughput is dominated by eager
dispatch.  This script builds an equivalent keras model — same shapes: sum
encoder over the crello column set, 4 pre-norm blocks (D=256, 8 heads,
2D MLP), per-field heads — and times eager forward+backward+Adam steps at
batch 256 on this machine.  The result anchors ``vs_baseline`` in bench.py
(written to BASELINE_MEASURED.json).

Favorable-to-the-reference simplifications: the per-step masking pipeline
(which the reference also ran eagerly, 5 maskings per step) is excluded, and
losses are plain CE/MSE without the per-field score bookkeeping.

Run: python tools/measure_tf_baseline.py [--steps N] [--batch-size N]
"""

from __future__ import annotations

# Repo-root bootstrap so `python tools/measure_tf_baseline.py` works without pip install.
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
import os
import time

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--latent-dim", type=int, default=256)
    parser.add_argument("--num-blocks", type=int, default=4)
    args = parser.parse_args()

    import tensorflow as tf

    B, S, D = args.batch_size, 50, args.latent_dim
    H = 8

    # crello-shaped columns: (name, kind, channels, vocab)
    columns = [
        ("type", "cat", 1, 7),
        ("left", "cat", 1, 64),
        ("top", "cat", 1, 64),
        ("width", "cat", 1, 64),
        ("height", "cat", 1, 64),
        ("opacity", "cat", 1, 8),
        ("color", "cat", 3, 16),
        ("font_family", "cat", 1, 13),
        ("image_embedding", "num", 512, 0),
        ("text_embedding", "num", 512, 0),
    ]

    class Block(tf.keras.layers.Layer):
        def __init__(self):
            super().__init__()
            self.norm1 = tf.keras.layers.LayerNormalization()
            self.norm2 = tf.keras.layers.LayerNormalization()
            self.q = tf.keras.layers.Dense(D)
            self.k = tf.keras.layers.Dense(D)
            self.v = tf.keras.layers.Dense(D)
            self.o = tf.keras.layers.Dense(D)
            self.mlp1 = tf.keras.layers.Dense(2 * D, activation="relu")
            self.mlp2 = tf.keras.layers.Dense(D)

        def call(self, x, mask):
            y = self.norm1(x)
            bsz = tf.shape(x)[0]

            def heads(t):
                t = tf.reshape(t, (bsz, -1, H, D // H))
                return tf.transpose(t, (0, 2, 1, 3))

            q, k, v = heads(self.q(y)), heads(self.k(y)), heads(self.v(y))
            score = tf.matmul(q, k, transpose_b=True) / np.sqrt(D // H)
            score += -1e9 * (1.0 - mask[:, None, None, :])
            p = tf.nn.softmax(score, -1)
            a = tf.transpose(tf.matmul(p, v), (0, 2, 1, 3))
            x = x + self.o(tf.reshape(a, (bsz, -1, D)))
            return x + self.mlp2(self.mlp1(self.norm2(x)))

    class Model(tf.keras.Model):
        def __init__(self):
            super().__init__()
            self.embs = {}
            self.heads = {}
            for name, kind, c, vocab in columns:
                if kind == "cat":
                    self.embs[name] = tf.keras.layers.Embedding(vocab + 2, D)
                    self.heads[name] = tf.keras.layers.Dense(c * vocab)
                else:
                    self.embs[name] = tf.keras.layers.Dense(D)
                    self.heads[name] = tf.keras.layers.Dense(c)
            self.blocks = [Block() for _ in range(args.num_blocks)]

        def call(self, inputs, mask):
            x = 0.0
            for name, kind, c, vocab in columns:
                if kind == "cat":
                    x += tf.reduce_sum(self.embs[name](inputs[name]), axis=2)
                else:
                    x += self.embs[name](inputs[name])
            for b in self.blocks:
                x = b(x, mask)
            return {name: self.heads[name](x) for name, _, _, _ in columns}

    rng = np.random.default_rng(0)
    inputs = {}
    labels = {}
    for name, kind, c, vocab in columns:
        if kind == "cat":
            inputs[name] = tf.constant(
                rng.integers(0, vocab, (B, S, c)), tf.int32
            )
            labels[name] = inputs[name]
        else:
            inputs[name] = tf.constant(
                rng.normal(size=(B, S, c)).astype(np.float32)
            )
            labels[name] = inputs[name]
    mask = tf.constant((rng.uniform(size=(B, S)) < 0.5).astype(np.float32))

    model = Model()
    opt = tf.keras.optimizers.Adam(1e-4, clipnorm=1.0)

    def step():
        with tf.GradientTape() as tape:
            out = model(inputs, mask)
            loss = 0.0
            for name, kind, c, vocab in columns:
                if kind == "cat":
                    logits = tf.reshape(out[name], (B, S, c, vocab))
                    loss += tf.reduce_mean(
                        tf.keras.losses.sparse_categorical_crossentropy(
                            labels[name], logits, from_logits=True
                        )
                    )
                else:
                    loss += tf.reduce_mean(
                        tf.square(out[name] - labels[name])
                    )
        grads = tape.gradient(loss, model.trainable_variables)
        opt.apply_gradients(zip(grads, model.trainable_variables))
        return loss

    step()  # build
    t0 = time.perf_counter()
    for _ in range(args.steps):
        loss = step()
    elapsed = time.perf_counter() - t0
    steps_per_sec = args.steps / elapsed

    result = {
        "tf_eager_steps_per_sec": steps_per_sec,
        "batch_size": B,
        "latent_dim": D,
        "num_blocks": args.num_blocks,
        "tf_version": tf.__version__,
        "device": "cpu" if not tf.config.list_physical_devices("GPU") else "gpu",
        "loss": float(loss),
        "note": (
            "Eager train step (fwd+bwd+Adam) of a reference-equivalent keras "
            "model; the reference's own eager masking overhead is excluded "
            "(favorable to the reference)."
        ),
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BASELINE_MEASURED.json",
    )
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
