"""``convert`` entry point — reference TF1 checkpoint → sgg workdir.

Produces a self-describing workdir (config.json + vocab.json + orbax
checkpoint) whose generator weights come from a reference checkpoint, so
``sgg.cli.generate`` decodes with the reference's weights — the parity path
of BASELINE.json:5 ("bit-comparable triple outputs on the same checkpoints").

  python -m sgg.cli.convert --tf-ckpt ref/model.ckpt --vocab ref_vocab.json \
      --config vg1k --workdir /tmp/converted
"""

from __future__ import annotations

import argparse
import sys

import jax
import numpy as np

from sgg.cli.common import add_config_args, apply_platform, resolve_config
from sgg.convert import convert_from_arrays, read_tf_checkpoint
from sgg.data.vocab import Vocab
from sgg.train.checkpoint import CheckpointManager
from sgg.train.state import create_train_state


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    add_config_args(p)
    p.add_argument("--tf-ckpt", default=None, help="TF1 Saver checkpoint prefix")
    p.add_argument("--npz", default=None, help="name→array .npz with reference vars")
    p.add_argument("--vocab", required=True, help="vocab.json matching the checkpoint")
    p.add_argument("--lenient", action="store_true",
                   help="leave unmatched params at their initialization")
    args = p.parse_args(argv)
    apply_platform(args)

    if not (args.tf_ckpt or args.npz):
        p.error("one of --tf-ckpt / --npz is required")
    if not args.workdir:
        p.error("--workdir is required")

    vocab = Vocab.load(args.vocab)
    cfg = resolve_config(args)
    cfg.model.vocab_size = len(vocab)

    if args.tf_ckpt:
        tf_vars = read_tf_checkpoint(args.tf_ckpt)
    else:
        with np.load(args.npz) as z:
            tf_vars = {k: z[k] for k in z.files}
    print(f"[sgg.convert] {len(tf_vars)} reference variables", flush=True)

    state = create_train_state(cfg, jax.random.key(cfg.train.seed))
    g_params, unmatched = convert_from_arrays(
        tf_vars, state.g_params, strict=not args.lenient
    )
    if unmatched:
        print(f"[sgg.convert] WARNING unmatched: {unmatched}", file=sys.stderr)
    state = state.replace(g_params=g_params)

    ckpt = CheckpointManager(cfg.workdir, cfg)
    ckpt.save_vocab(vocab)
    ckpt.save(state)
    ckpt.close()
    print(f"[sgg.convert] wrote converted checkpoint → {cfg.workdir}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
