"""Orbax checkpointing with auto-resume.

Reference capability (SURVEY.md §5 "Checkpoint/resume"): periodic
``tf.train.Saver`` saves, manual restore. Rebuild: orbax
``CheckpointManager`` saving the whole ``GANTrainState`` pytree with
``max_to_keep`` retention and automatic resume-from-latest on startup —
the failure-recovery model is restart-and-resume, automated.

The workdir layout is self-describing: ``config.json`` + ``vocab.json``
next to the ``checkpoints/`` directory, so inference needs only a workdir.
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp

from sgg.config import Config
from sgg.data.vocab import Vocab
from sgg.train.state import GANTrainState


class CheckpointManager:
    def __init__(self, workdir: str, cfg: Config, max_to_keep: int = 3):
        self.workdir = workdir
        self.ckpt_dir = os.path.join(workdir, "checkpoints")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
            ),
        )
        with open(os.path.join(workdir, "config.json"), "w") as f:
            f.write(cfg.to_json())

    def save_vocab(self, vocab: Vocab) -> None:
        vocab.save(os.path.join(self.workdir, "vocab.json"))

    def save(self, state: GANTrainState) -> None:
        self._mgr.save(int(state.step), args=ocp.args.StandardSave(state))

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(
        self, abstract_state: GANTrainState, lenient: bool = True
    ) -> GANTrainState | None:
        """Restore latest checkpoint into the structure of ``abstract_state``.

        With ``lenient`` (default), structure drift between the checkpoint
        and the current TrainState (e.g. fields added in newer versions)
        falls back to a partial restore: matching subtrees load, new fields
        keep their initialized values, and a warning is printed.
        """
        step = self._mgr.latest_step()
        if step is None:
            return None
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state)
        try:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(target))
        except Exception as strict_err:  # noqa: BLE001 — orbax raises ValueError subtypes
            if not lenient:
                raise
            import sys

            print(
                f"[sgg.checkpoint] strict restore failed "
                f"({type(strict_err).__name__}); retrying with optional "
                "fields dropped — they keep their initialized values",
                file=sys.stderr,
            )
            # Known drift class: optional TrainState fields (enc_params)
            # added after the checkpoint was written — the checkpoint holds
            # None where the new state holds a subtree. Restore the old
            # structure, then graft the initialized values back.
            legacy = abstract_state.replace(enc_params=None)
            target = jax.tree.map(ocp.utils.to_shape_dtype_struct, legacy)
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(target)
            )
            return restored.replace(enc_params=abstract_state.enc_params)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def load_workdir(workdir: str) -> tuple[Config, Vocab]:
    """Read back the self-describing workdir written by training."""
    with open(os.path.join(workdir, "config.json")) as f:
        cfg = Config.from_json(f.read())
    vocab = Vocab.load(os.path.join(workdir, "vocab.json"))
    return cfg, vocab
