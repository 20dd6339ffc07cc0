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

    def restore(self, abstract_state: GANTrainState) -> GANTrainState | None:
        """Restore latest checkpoint into the structure of ``abstract_state``."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(target))

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
