"""Command-line entry points.

``python -m flexdm_tpu ...`` mirrors the reference trainer CLI
(reference ``src/mfp/mfp/main.py`` + ``args.py``), and
``python -m flexdm_tpu.evaluation ...`` mirrors ``eval.py``.
"""

from __future__ import annotations

import argparse
import logging


def _apply_preset(argv, parser):
    """--preset <name|path> loads configs/<name>.json as argument defaults
    (explicit CLI flags still win)."""
    import json
    import os

    argv = list(argv)
    if "--preset" not in argv:
        return argv
    i = argv.index("--preset")
    name = argv[i + 1]
    del argv[i : i + 2]
    path = name if os.path.exists(name) else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", name + ".json",
    )
    with open(path) as f:
        preset = json.load(f)
    parser.set_defaults(**preset)
    # preset may satisfy required args
    for action in parser._actions:
        if action.dest in preset:
            action.required = False
    return argv


def _add_base_args(parser: argparse.ArgumentParser) -> None:
    # Mirrors reference args.py:6-92.
    parser.add_argument(
        "--dataset_name", required=True, choices=["rico", "crello"]
    )
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--weights", default=None, type=str,
                        help="checkpoint path for warm start / fine-tuning")
    parser.add_argument("--latent_dim", default=256, type=int)
    parser.add_argument("--num_blocks", default=4, type=int)
    parser.add_argument(
        "--arch_type", default="oneshot",
        choices=["oneshot", "canvasvae", "layoutvae", "autoreg", "bart_autoreg"],
    )
    parser.add_argument("--kl", default=1.0, type=float,
                        help="KL weight for VAE baselines")
    parser.add_argument("--block_type", default="deepsvg",
                        choices=["deepsvg", "transformer"])
    parser.add_argument("--l2", default=1e-2, type=float)
    parser.add_argument("--dropout", default=0.1, type=float)
    parser.add_argument("--masking_method", default="random", type=str)
    parser.add_argument("--seq_type", default="default",
                        choices=["default", "flat"])
    parser.add_argument("--log_level", default="INFO", type=str)
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--context", default=None)
    parser.add_argument("--input_dtype", default="set",
                        choices=["set", "shuffled_set"])
    parser.add_argument("--batch_size", default=256, type=int)
    parser.add_argument("--attention_impl", default="auto",
                        choices=["auto", "xla", "pallas"])
    parser.add_argument("--dtype", default=None,
                        help="model compute dtype (e.g. bfloat16); params stay f32")
    parser.add_argument("--num_devices", default=None, type=int)
    parser.add_argument("--model_parallel", default=1, type=int)


def train_main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Train an MFP model (TPU-native flex-dm)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    _add_base_args(parser)
    # Mirrors reference args.py:94-128.
    parser.add_argument("--job-dir", dest="job_dir", required=True)
    parser.add_argument("--num_epochs", default=500, type=int)
    parser.add_argument("--learning_rate", default=1e-4, type=float)
    parser.add_argument("--enable_profile", action="store_true")
    parser.add_argument("--validation_freq", default=10, type=int)
    parser.add_argument("--resume", action="store_true",
                        help="resume from <job-dir>/checkpoints/last")
    parser.add_argument("--input_mode", default="device",
                        choices=["device", "host"],
                        help="device: whole split resident in HBM, on-device "
                             "batch gather; host: prefetch-threaded streaming")
    parser.add_argument("--checkpoint_every", default=None, type=int,
                        help="refresh the resumable 'last' checkpoint every N "
                             "epochs (default: every validation; 0 = only at "
                             "end of run)")
    import sys

    argv = _apply_preset(
        argv if argv is not None else sys.argv[1:], parser
    )
    args = parser.parse_args(argv)

    logging.basicConfig(level=getattr(logging, args.log_level.upper()))

    # Product entry points share the persistent XLA cache: a re-run (or a
    # demo/eval/serve process after training) starts in seconds instead of
    # paying the remote compile again.
    from .utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from .train.trainer import TrainConfig, train

    config = TrainConfig(
        dataset_name=args.dataset_name,
        data_dir=args.data_dir,
        job_dir=args.job_dir,
        weights=args.weights,
        latent_dim=args.latent_dim,
        num_blocks=args.num_blocks,
        block_type=args.block_type,
        arch_type=args.arch_type,
        masking_method=args.masking_method,
        seq_type=args.seq_type,
        context=args.context,
        input_dtype=args.input_dtype,
        l2=args.l2,
        dropout=args.dropout,
        kl=args.kl,
        batch_size=args.batch_size,
        num_epochs=args.num_epochs,
        learning_rate=args.learning_rate,
        validation_freq=args.validation_freq,
        seed=args.seed,
        attention_impl=args.attention_impl,
        dtype=args.dtype,
        num_devices=args.num_devices,
        model_parallel=args.model_parallel,
        enable_profile=args.enable_profile,
        resume=args.resume,
        checkpoint_every=args.checkpoint_every,
        input_mode=args.input_mode,
    )
    results = train(config)
    print("test metrics:")
    for k, v in sorted(results["test_metrics"].items()):
        print(f"  {k}: {v:.4f}")


def eval_main(argv=None) -> None:
    from .evaluation.harness import main as harness_main

    harness_main(argv)
