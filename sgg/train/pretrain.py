"""Supervised encoder pretraining on object-presence labels.

The reference pipeline assumes an ImageNet-PRETRAINED VGG-19 whose `.npy`
weights this offline machine cannot download (SURVEY.md §2.1 #2;
BASELINE.md "Full-corpus quality probe"): through a random-init encoder the
image→triple mapping never beats the trivial frequency baseline. This module
closes that gap without external weights (VERDICT r2 item 1): the synthetic
corpus generator knows every image's object set (`sgg/data/synthetic.py`
renders one colored rectangle per entity), so object presence is a free
supervised auxiliary task. Pretraining the encoder on it gives the GAN the
same thing ImageNet weights give the reference — features that identify the
objects in the image — after which `sgg.cli.preprocess --encoder-ckpt`
extracts features exactly as it would with `--vgg-weights`.

TPU design: ONE jitted step (encoder fwd + head + BCE + Adam update, bf16
compute / f32 params) over a device-resident uint8 image store with on-device
batch gather — zero per-step host traffic, same recipe as the fused GAN step
(`sgg/data/pipeline.py`). The presence head max-pools per-region logits over
the spatial axis (weakly-supervised localization: an object is present if
ANY region says so), which keeps gradients flowing to the regions that
contain the object — the same spatial features the triple decoder later
attends over.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from sgg.models.encoders import make_encoder, normalize_for


class PresenceHead(nn.Module):
    """Region features [B, R, F] → presence logits [B, V] + per-region logits.

    Per-region projection then max over regions: presence is "some region
    contains it", and the max routes gradient to exactly those regions. The
    pre-max per-region logits are returned too so the SPATIAL task (per-cell
    owner classification from the grounded corpus's boxes) can supervise the
    same projection — no extra parameters, strictly richer gradient.
    """

    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        x = nn.Dense(self.num_classes, name="proj", dtype=self.dtype)(feats)
        x = x.astype(jnp.float32)
        return jnp.max(x, axis=1), x


class PresenceModel(nn.Module):
    """Encoder + presence head; ``encoder`` params are the pretrain product.

    Returns ``{"presence": [B, V], "regions": [B, R, V]}`` (float32 logits).
    """

    encoder_name: str
    num_classes: int
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32
    image_size: int = 224
    moe_experts: int = 0  # vit_b16 only: MoE MLP blocks (sgg.models.moe)
    moe_top_k: int = 2
    vit_dims: tuple = (768, 12, 12)  # vit_b16 only: (dim, layers, heads)

    def setup(self):
        self.encoder = make_encoder(
            self.encoder_name, use_pallas=self.use_pallas, dtype=self.dtype,
            image_size=self.image_size, moe_experts=self.moe_experts,
            moe_top_k=self.moe_top_k, vit_dims=self.vit_dims,
        )
        self.head = PresenceHead(self.num_classes, dtype=self.dtype)

    def __call__(self, images_u8: jnp.ndarray) -> dict[str, jnp.ndarray]:
        x = normalize_for(self.encoder_name, images_u8)
        presence, regions = self.head(self.encoder(x))
        return {"presence": presence, "regions": regions}


def multi_hot_labels(
    triples_per_image: Sequence[np.ndarray], vocab_size: int
) -> np.ndarray:
    """Per-image multi-hot over the subject/object token ids (float32 [N, V])."""
    out = np.zeros((len(triples_per_image), vocab_size), np.float32)
    for i, t in enumerate(triples_per_image):
        t = np.asarray(t, np.int32).reshape(-1, 3)
        out[i, t[:, 0]] = 1.0
        out[i, t[:, 2]] = 1.0
    out[:, 0] = 0.0  # never predict <pad>
    return out


def feature_grid(encoder_name: str, image_size: int) -> int:
    """Side length of the encoder's spatial feature grid (R = grid²)."""
    return image_size // (32 if encoder_name == "resnet50" else 16)


def cell_labels(
    entities_per_image: Sequence[Sequence[tuple[str, tuple]]],
    vocab,
    grid: int,
    image_wh: tuple[int, int],
) -> np.ndarray:
    """Per-cell owner labels int32 [N, grid²] for the spatial pretrain task.

    Each cell takes the vocab id of the SMALLEST entity box containing its
    center — the box the grounded renderer draws on top
    (`render_grounded_image` paints larger boxes first), so the label is the
    object actually visible at that cell. Cells no box covers get 0
    (``<pad>`` doubles as background). Entities whose name is out of vocab
    are skipped.

    This teaches the encoder WHAT is WHERE, which is exactly the signal the
    grounded corpus's geometric predicates (left of / above / inside …)
    require — object presence alone says nothing about position.
    """
    w, h = image_wh
    n = len(entities_per_image)
    out = np.zeros((n, grid * grid), np.int32)
    # Cell centers in image pixel coordinates.
    cx = (np.arange(grid, dtype=np.float32) + 0.5) * (w / grid)
    cy = (np.arange(grid, dtype=np.float32) + 0.5) * (h / grid)
    for i, ents in enumerate(entities_per_image):
        labels = out[i].reshape(grid, grid)
        # Larger boxes first; later (smaller) boxes overwrite = draw order.
        for name, (x, y, bw, bh) in sorted(
            ents, key=lambda e: -(e[1][2] * e[1][3])
        ):
            tid = vocab.id(name)
            if tid == vocab.unk_id or tid == 0:
                continue
            row = (cy >= y) & (cy < y + bh)
            col = (cx >= x) & (cx < x + bw)
            labels[np.ix_(row, col)] = tid
    return out


def make_pretrain_state(
    encoder_name: str,
    vocab_size: int,
    image_size: int = 224,
    lr: float = 1e-4,
    use_pallas: bool = False,
    dtype=jnp.float32,
    seed: int = 0,
    moe_experts: int = 0,
    moe_top_k: int = 2,
    vit_dims: tuple = (768, 12, 12),
):
    """Returns (model, params, opt_state, tx)."""
    model = PresenceModel(
        encoder_name=encoder_name, num_classes=vocab_size,
        use_pallas=use_pallas, dtype=dtype, image_size=image_size,
        moe_experts=moe_experts, moe_top_k=moe_top_k, vit_dims=vit_dims,
    )
    sample = jnp.zeros((1, image_size, image_size, 3), jnp.uint8)
    params = model.init(jax.random.key(seed), sample)["params"]
    tx = optax.adam(lr)
    return model, params, tx.init(params), tx


def make_pretrain_step(
    model: PresenceModel,
    tx,
    batch_size: int,
    seed: int = 0,
    spatial: bool = False,
    spatial_weight: float = 1.0,
):
    """Jitted fused step over a device-resident image/label store.

    ``images``/``labels`` are ARGUMENTS (not closures — remote compile
    rejects multi-GB program constants, CLAUDE.md); the batch is gathered
    on-device from indices derived inside the program.

    With ``spatial=True`` the step signature gains a ``cells`` store
    (int32 [N, R] from :func:`cell_labels`) and the loss adds a per-cell
    softmax CE over the head's pre-max region logits — same parameters,
    position-aware supervision.
    """
    base = jax.random.key(seed)

    def loss_fn(params, imgs, labs, cells):
        # mutable=["moe"]: collect MoE load-balance losses when the encoder
        # is a MoE ViT (empty otherwise — no-op for dense encoders).
        out, cols = model.apply({"params": params}, imgs, mutable=["moe"])
        logits = out["presence"]
        # Mean over classes and batch; positives are ~3% of classes, but the
        # task (distinct colors) is separable — plain BCE converges.
        losses = optax.sigmoid_binary_cross_entropy(logits, labs)
        loss = losses.mean()
        # Presence recall at 0.5 over true positives (progress metric).
        hit = ((logits > 0.0) & (labs > 0.5)).sum() / jnp.maximum(
            (labs > 0.5).sum(), 1
        )
        metrics = {"presence_recall": hit}
        if spatial:
            ce = optax.softmax_cross_entropy_with_integer_labels(
                out["regions"], cells
            ).mean()
            loss = loss + spatial_weight * ce
            pred = jnp.argmax(out["regions"], axis=-1)
            fg = cells > 0  # non-background cells only — the hard part
            metrics["cell_acc"] = ((pred == cells) & fg).sum() / jnp.maximum(
                fg.sum(), 1
            )
        aux = jax.tree.leaves(cols.get("moe", {}))
        if aux:  # Switch-style load balance, standard 0.01 weight
            loss = loss + 0.01 * sum(aux) / len(aux)
        metrics["loss"] = loss
        return loss, metrics

    @jax.jit
    def step(params, opt_state, images, labels, cells, n, step_idx):
        idx = jax.random.randint(
            jax.random.fold_in(base, step_idx), (batch_size,), 0, n
        )
        imgs, labs = images[idx], labels[idx]
        cell = cells[idx] if spatial else None
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, imgs, labs, cell
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    if spatial:
        return step

    def step_no_cells(params, opt_state, images, labels, n, step_idx):
        return step(params, opt_state, images, labels, images, n, step_idx)

    return step_no_cells


def evaluate_presence(
    model: PresenceModel, params, images: np.ndarray, labels: np.ndarray,
    batch_size: int = 32, cells: np.ndarray | None = None,
) -> dict:
    """Held-out presence quality: BCE loss + recall of positives at 0.5 +
    precision@k where k = per-image positive count. With ``cells`` (the
    spatial task's [N, R] owner labels) also reports non-background cell
    accuracy."""

    @jax.jit
    def fwd(p, imgs):
        return model.apply({"params": p}, imgs)

    n = images.shape[0]
    tot_loss, tot_hit, tot_pos, tot_prec = 0.0, 0.0, 0, 0.0
    cell_hit, cell_fg = 0, 0
    for lo in range(0, n, batch_size):
        imgs = jnp.asarray(images[lo : lo + batch_size])
        labs = labels[lo : lo + batch_size]
        out = fwd(params, imgs)
        if cells is not None:
            pred = np.asarray(jnp.argmax(out["regions"], axis=-1))
            lab_c = cells[lo : lo + batch_size]
            fg = lab_c > 0
            cell_hit += int(((pred == lab_c) & fg).sum())
            cell_fg += int(fg.sum())
        logits = np.asarray(out["presence"], np.float32)
        tot_loss += float(
            np.mean(
                np.logaddexp(0.0, logits) - labs * logits
            )
        ) * imgs.shape[0]
        hit = ((logits > 0.0) & (labs > 0.5)).sum()
        tot_hit += hit
        tot_pos += (labs > 0.5).sum()
        # precision@k: of the top-k scored classes, how many are true?
        for b in range(logits.shape[0]):
            k = int((labs[b] > 0.5).sum())
            if k == 0:
                continue
            topk = np.argpartition(-logits[b], k)[:k]
            tot_prec += labs[b][topk].sum() / k
    report = {
        "loss": tot_loss / max(n, 1),
        "presence_recall": float(tot_hit) / max(tot_pos, 1),
        "precision_at_k": float(tot_prec) / max(n, 1),
    }
    if cells is not None:
        report["cell_acc"] = cell_hit / max(cell_fg, 1)
    return report


# ---------------------------------------------------------------- params io


def save_params_npz(path: str, params) -> None:
    """Nested flax param dict → flat npz with '::'-joined keys.

    The separator must NOT be '/': VGG19Features names its params
    'conv1_1/kernel' (a single flat name mirroring the reference weight
    dict), which a '/'-split would wrongly re-nest.
    """
    flat = {}

    def rec(tree, prefix):
        for k, v in tree.items():
            key = f"{prefix}::{k}" if prefix else str(k)
            if isinstance(v, dict):
                rec(v, key)
            else:
                flat[key] = np.asarray(v)

    rec(params, "")
    np.savez_compressed(path, **flat)


def load_params_npz(path: str) -> dict:
    """Inverse of :func:`save_params_npz`."""
    raw = np.load(path)
    out: dict = {}
    for key in raw.files:
        parts = key.split("::")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = raw[key]
    return out
