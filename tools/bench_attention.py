"""Parameterized attention micro-benchmark: Pallas flash kernel vs XLA.

Measures fwd + FULL bwd (all three gradients consumed — letting XLA
dead-code-eliminate dk/dv was an earlier benchmarking trap, see
CLAUDE.md) at an arbitrary (B, H, S, Dh) shape, using the platform's
only reliable protocol: a ``lax.scan`` bundle with per-iteration
perturbation, ended by fetching a scalar VALUE to the host, best of N
windows (remote-relay stalls add seconds to single windows).

This is the tool behind the dispatch table in
``flexdm_tpu/ops/attention.py`` (``impl='auto'``).  Usage::

    python tools/bench_attention.py --b 8 --h 8 --s 512 --dh 64
    python tools/bench_attention.py --sweep 256,512,768,1024
    python tools/bench_attention.py --b 64 --h 8 --s 650 --dh 32  # flat-seq

Reference comparison point: the reference computes attention with plain
batched matmuls + softmax under TF eager
(/root/reference/src/mfp/mfp/models/architecture/transformer.py:60-76).
"""

from __future__ import annotations

# Repo-root bootstrap so `python tools/bench_attention.py` works without pip install.
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
import math
import time


def measure(b: int, h: int, s: int, dh: int, iters: int = 20,
            windows: int = 3, causal: bool = False,
            dtype: str = "float32", impls=("pallas", "xla")) -> dict:
    import jax
    import jax.numpy as jnp

    from flexdm_tpu.ops.attention import dot_product_attention

    key = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (b, h, s, dh),
                          dtype=jnp.dtype(dtype))
        for i in range(3)
    )
    mask = jnp.ones((b, s), bool)
    # Pallas compiles only on TPU; elsewhere fall back to interpreter mode
    # (functional smoke, meaningless timing — this tool is for the chip).
    interpret = jax.default_backend() != "tpu"
    out = {}
    for impl in impls:
        def loss(q, k, v):
            o = dot_product_attention(
                q, k, v, key_mask=mask, causal=causal, impl=impl,
                interpret=interpret)
            return jnp.sum((o * o).astype(jnp.float32))

        def many(q, k, v):
            def body(c, _):
                # Nonzero perturbation of q by the carry: no iteration can
                # be hoisted out of the loop; consume ALL THREE grads.
                gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(
                    q + (c * 1e-30).astype(q.dtype), k, v
                )
                return (
                    c
                    + jnp.sum(gq[0, 0, 0, :1]).astype(jnp.float32)
                    + jnp.sum(gk[0, 0, 0, :1]).astype(jnp.float32) * 1e-9
                    + jnp.sum(gv[0, 0, 0, :1]).astype(jnp.float32) * 1e-9
                ), None

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return c

        fn = jax.jit(many)
        float(fn(q, k, v))  # compile + warm
        best = math.inf
        for _ in range(windows):
            t0 = time.perf_counter()
            float(fn(q, k, v))  # VALUE fetch = the completion barrier
            best = min(best, time.perf_counter() - t0)
        out[f"{impl}_ms"] = round(1000 * best / iters, 3)
    if "pallas_ms" in out and "xla_ms" in out:
        out["xla_over_pallas"] = round(out["xla_ms"] / out["pallas_ms"], 2)
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=8)
    p.add_argument("--h", type=int, default=8)
    p.add_argument("--s", type=int, default=512)
    p.add_argument("--dh", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--windows", type=int, default=3)
    p.add_argument("--causal", action="store_true")
    p.add_argument("--dtype", default="float32")
    p.add_argument("--sweep", default=None,
                   help="comma-separated S values; overrides --s")
    args = p.parse_args()

    s_values = ([int(x) for x in args.sweep.split(",")]
                if args.sweep else [args.s])
    for s in s_values:
        res = measure(args.b, args.h, s, args.dh, iters=args.iters,
                      windows=args.windows, causal=args.causal,
                      dtype=args.dtype)
        print(json.dumps({"b": args.b, "h": args.h, "s": s,
                          "dh": args.dh, "dtype": args.dtype, **res}))


if __name__ == "__main__":
    main()
