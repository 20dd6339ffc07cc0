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
from sgg.convert import (
    DEFAULT_DISCRIMINATOR_MAPPING,
    DEFAULT_GENERATOR_MAPPING,
    DISCRIMINATOR_EXCLUDE,
    GENERATOR_EXCLUDE,
    convert_from_arrays,
    match_report,
    read_tf_checkpoint,
)
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
    p.add_argument("--skip-discriminator", action="store_true",
                   help="convert generator weights only")
    p.add_argument("--dry-run", action="store_true",
                   help="print the variable↔param match report and exit "
                        "without writing anything")
    args = p.parse_args(argv)
    apply_platform(args)

    if not (args.tf_ckpt or args.npz):
        p.error("one of --tf-ckpt / --npz is required")
    if not args.workdir and not args.dry_run:
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

    targets = {
        "generator": (state.g_params, DEFAULT_GENERATOR_MAPPING,
                      GENERATOR_EXCLUDE),
    }
    if not args.skip_discriminator:
        targets["discriminator"] = (
            state.d_params, DEFAULT_DISCRIMINATOR_MAPPING,
            DISCRIMINATOR_EXCLUDE,
        )

    if args.dry_run:
        rep = match_report(tf_vars, targets)
        for label, name, shape in rep["matched"]:
            print(f"  match     {label}  ←  {name}  {shape}")
        for label in rep["unmatched_params"]:
            print(f"  UNMATCHED {label}")
        for label, hits in rep["ambiguous"]:
            print(f"  AMBIGUOUS {label}  ←  {hits}")
        for name in rep["unused_vars"]:
            print(f"  unused    {name}")
        print(
            f"[sgg.convert] dry run: {len(rep['matched'])} matched, "
            f"{len(rep['unmatched_params'])} unmatched params, "
            f"{len(rep['ambiguous'])} ambiguous, "
            f"{len(rep['unused_vars'])} unused reference vars",
            flush=True,
        )
        return 1 if (rep["unmatched_params"] or rep["ambiguous"]) else 0

    g_params, unmatched = convert_from_arrays(
        tf_vars, state.g_params, strict=not args.lenient,
        exclude=GENERATOR_EXCLUDE,
    )
    if unmatched:
        print(f"[sgg.convert] WARNING unmatched: {unmatched}", file=sys.stderr)
    state = state.replace(g_params=g_params)

    if not args.skip_discriminator:
        rep = match_report(
            tf_vars,
            {"d": (state.d_params, DEFAULT_DISCRIMINATOR_MAPPING,
                   DISCRIMINATOR_EXCLUDE)},
        )
        if not rep["matched"]:
            # Source holds no recognizable critic variables (e.g. a
            # generator-only .npz) — a G-only conversion stays valid.
            print(
                "[sgg.convert] no discriminator variables found — converting "
                "generator only",
                flush=True,
            )
        else:
            d_params, d_unmatched = convert_from_arrays(
                tf_vars, state.d_params,
                mapping=DEFAULT_DISCRIMINATOR_MAPPING,
                strict=not args.lenient, exclude=DISCRIMINATOR_EXCLUDE,
            )
            if d_unmatched:
                print(
                    f"[sgg.convert] WARNING unmatched (discriminator): "
                    f"{d_unmatched}",
                    file=sys.stderr,
                )
            state = state.replace(d_params=d_params)

    ckpt = CheckpointManager(cfg.workdir, cfg)
    ckpt.save_vocab(vocab)
    ckpt.save(state)
    ckpt.close()
    print(f"[sgg.convert] wrote converted checkpoint → {cfg.workdir}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
