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
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp
from jax.tree_util import tree_flatten_with_path, tree_unflatten

from sgg.config import Config
from sgg.data.vocab import Vocab
from sgg.train.state import GANTrainState


def _flatten_raw(tree, prefix=()):
    """Flatten a raw orbax restore (nested dicts/lists) to {path: leaf}."""
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten_raw(v, prefix + (str(k),))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _flatten_raw(v, prefix + (str(i),))
    elif tree is not None:
        yield prefix, tree


def _path_tokens(path) -> tuple[str, ...]:
    """Normalize a jax key path to the string tokens raw orbax trees use."""
    out = []
    for e in path:
        if isinstance(e, jax.tree_util.GetAttrKey):
            out.append(e.name)
        elif isinstance(e, jax.tree_util.DictKey):
            out.append(str(e.key))
        elif isinstance(e, jax.tree_util.SequenceKey):
            out.append(str(e.idx))
        elif isinstance(e, jax.tree_util.FlattenedIndexKey):
            out.append(str(e.key))
        else:  # pragma: no cover - future key types
            out.append(str(e))
    return tuple(out)


def merge_checkpoint(raw, init_state, *, verbose: bool = True):
    """Graft a raw checkpoint tree onto ``init_state`` field by field.

    The compatibility contract (NOTES.md round-1 #7): leaves present in both
    trees with matching shapes restore (dtype is cast if it drifted); leaves
    only in ``init_state`` (fields added since the checkpoint was written)
    keep their initialized values; leaves only in the checkpoint (fields
    since removed) are ignored. Shape mismatches keep the initialized value.
    Returns (merged_state, report dict).
    """
    raw_map = dict(_flatten_raw(raw))
    leaves, treedef = tree_flatten_with_path(init_state)
    out, report = [], {"restored": 0, "kept": [], "ignored": []}
    for path, leaf in leaves:
        key = _path_tokens(path)
        val = raw_map.pop(key, None)
        if (
            val is not None
            and hasattr(leaf, "shape")
            and getattr(val, "shape", None) == leaf.shape
        ):
            out.append(jnp.asarray(val, leaf.dtype))
            report["restored"] += 1
        else:
            out.append(leaf)
            report["kept"].append("/".join(key))
    report["ignored"] = ["/".join(k) for k in raw_map]
    if verbose and (report["kept"] or report["ignored"]):
        import sys

        print(
            f"[sgg.checkpoint] lenient restore: {report['restored']} leaves "
            f"restored; kept initialized: {report['kept'] or '—'}; "
            f"ignored from checkpoint: {report['ignored'] or '—'}",
            file=sys.stderr,
        )
    return tree_unflatten(treedef, out), report


class CheckpointManager:
    def __init__(self, workdir: str, cfg: Config, max_to_keep: int = 3):
        # orbax's async checkpointer requires absolute paths (tensorstore
        # kvstore spec); a relative --workdir otherwise dies in a background
        # serialization thread with a confusing traceback.
        workdir = os.path.abspath(workdir)
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

    def save(self, state: GANTrainState, data_state: bytes | None = None) -> None:
        step = int(state.step)
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if data_state is not None:
            # Input-iterator snapshot (grain loader): a sidecar next to the
            # orbax step dirs, kept OUT of the orbax item tree so the model
            # checkpoint layout (and the pinned ckpt_v1 compat fixture)
            # stays unchanged. Pruned to the same retention window.
            with open(self._data_state_path(step), "wb") as f:
                f.write(data_state)
            keep = {step} | set(self._mgr.all_steps())
            for name in os.listdir(self.ckpt_dir):
                if name.startswith("data_iter_") and name.endswith(".bin"):
                    s = int(name[len("data_iter_"):-len(".bin")])
                    if s not in keep:
                        os.remove(os.path.join(self.ckpt_dir, name))

    def _data_state_path(self, step: int) -> str:
        return os.path.join(self.ckpt_dir, f"data_iter_{step}.bin")

    def restore_data_state(self) -> bytes | None:
        """Input-iterator snapshot saved with the latest checkpoint, if any."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        path = self._data_state_path(step)
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            return f.read()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def all_steps(self) -> list[int]:
        """Retained checkpoint steps, ascending."""
        return sorted(int(s) for s in self._mgr.all_steps())

    def restore(
        self, abstract_state: GANTrainState, lenient: bool = True,
        step: int | None = None,
    ) -> GANTrainState | None:
        """Restore a checkpoint into the structure of ``abstract_state``.

        ``step`` selects a retained checkpoint (default: the latest). With
        ``lenient`` (default), structure drift between the checkpoint
        and the current TrainState falls back to a field-by-field partial
        restore via ``merge_checkpoint``: leaves present in both trees with
        matching shapes load, fields added since the checkpoint was written
        keep their initialized values, fields since removed are ignored,
        and a warning lists both. ``abstract_state`` must then hold concrete
        initialized arrays (it does at every call site), since kept leaves
        pass through to the result.
        """
        if step is None:
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
                f"({type(strict_err).__name__}); falling back to lenient "
                "field-by-field restore",
                file=sys.stderr,
            )
            raw = self._mgr.restore(step)
            merged, _ = merge_checkpoint(raw, abstract_state)
            return merged

    def restore_averaged(
        self, abstract_state: GANTrainState, last_n: int,
        lenient: bool = True,
    ) -> GANTrainState | None:
        """Latest state with GENERATOR weights tail-averaged over retained
        checkpoints (offline SWA/Polyak: Izmailov et al. 2018 average late
        SGD iterates for flatter minima; here the uniform mean of the last
        ``last_n`` saved ``g_params`` — and ``g_ema`` when tracked — is an
        eval-time alternative to in-loop EMA that needs no training-time
        decision and composes with it: ``--avg-last N --ema`` averages the
        EMA trajectory itself).

        Everything except the averaged generator trees (critic, optimizer
        states, step, rng, encoder) comes from the LATEST checkpoint.
        Averaging runs in float32 on host and casts back per-leaf, so
        bf16 runs don't accumulate rounding across the sum. Returns None
        when no checkpoint exists; with one retained checkpoint this
        degrades to plain :meth:`restore`.

        Checkpoints are restored ONE AT A TIME with only the running
        float32 generator sums retained — materializing all N full states
        (critic + both optimizer trees + encoder) at once was ~N× the peak
        state RSS on a host that already runs an RSS watchdog. Non-latest
        checkpoints restore with lenient=False regardless of ``lenient``:
        a structure-drifted old checkpoint would otherwise have its
        freshly-initialized (random) fallback leaves silently averaged
        into the SWA weights — that must fail loudly instead.
        """
        steps = self.all_steps()[-max(1, int(last_n)):]
        if not steps:
            return None
        latest = self.restore(abstract_state, lenient, step=steps[-1])
        if len(steps) == 1:
            return latest

        def _f32(tree):
            return jax.tree.map(lambda x: np.asarray(x, np.float32), tree)

        def _add(acc, tree):
            return jax.tree.map(
                lambda a, x: a + np.asarray(x, np.float32), acc, tree
            )

        sum_g = _f32(latest.g_params)
        sum_e = _f32(latest.g_ema) if latest.g_ema is not None else None
        for s in steps[:-1]:
            st = self.restore(abstract_state, False, step=s)
            sum_g = _add(sum_g, st.g_params)
            if sum_e is not None:
                sum_e = _add(sum_e, st.g_ema)
            del st  # drop the full state before restoring the next one

        n = float(len(steps))

        def _mean_like(acc, ref):
            return jax.tree.map(
                lambda a, r: jnp.asarray(
                    (a / n).astype(np.asarray(r).dtype)
                ),
                acc, ref,
            )

        out = latest.replace(g_params=_mean_like(sum_g, latest.g_params))
        if sum_e is not None:
            out = out.replace(g_ema=_mean_like(sum_e, latest.g_ema))
        return out

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
