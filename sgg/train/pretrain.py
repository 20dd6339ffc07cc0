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
    """Region features [B, R, F] → multi-label presence logits [B, V].

    Per-region projection then max over regions: presence is "some region
    contains it", and the max routes gradient to exactly those regions.
    """

    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.num_classes, name="proj", dtype=self.dtype)(feats)
        return jnp.max(x, axis=1).astype(jnp.float32)


class PresenceModel(nn.Module):
    """Encoder + presence head; ``encoder`` params are the pretrain product."""

    encoder_name: str
    num_classes: int
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32
    image_size: int = 224

    def setup(self):
        self.encoder = make_encoder(
            self.encoder_name, use_pallas=self.use_pallas, dtype=self.dtype,
            image_size=self.image_size,
        )
        self.head = PresenceHead(self.num_classes, dtype=self.dtype)

    def __call__(self, images_u8: jnp.ndarray) -> jnp.ndarray:
        x = normalize_for(self.encoder_name, images_u8)
        return self.head(self.encoder(x))


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


def make_pretrain_state(
    encoder_name: str,
    vocab_size: int,
    image_size: int = 224,
    lr: float = 1e-4,
    use_pallas: bool = False,
    dtype=jnp.float32,
    seed: int = 0,
):
    """Returns (model, params, opt_state, tx)."""
    model = PresenceModel(
        encoder_name=encoder_name, num_classes=vocab_size,
        use_pallas=use_pallas, dtype=dtype, image_size=image_size,
    )
    sample = jnp.zeros((1, image_size, image_size, 3), jnp.uint8)
    params = model.init(jax.random.key(seed), sample)["params"]
    tx = optax.adam(lr)
    return model, params, tx.init(params), tx


def make_pretrain_step(model: PresenceModel, tx, batch_size: int, seed: int = 0):
    """Jitted fused step over a device-resident image/label store.

    ``images``/``labels`` are ARGUMENTS (not closures — remote compile
    rejects multi-GB program constants, CLAUDE.md); the batch is gathered
    on-device from indices derived inside the program.
    """
    base = jax.random.key(seed)

    def loss_fn(params, imgs, labs):
        logits = model.apply({"params": params}, imgs)
        # Mean over classes and batch; positives are ~3% of classes, but the
        # task (distinct colors) is separable — plain BCE converges.
        losses = optax.sigmoid_binary_cross_entropy(logits, labs)
        loss = losses.mean()
        # Presence recall at 0.5 over true positives (progress metric).
        hit = ((logits > 0.0) & (labs > 0.5)).sum() / jnp.maximum(
            (labs > 0.5).sum(), 1
        )
        return loss, hit

    @jax.jit
    def step(params, opt_state, images, labels, n, step_idx):
        idx = jax.random.randint(
            jax.random.fold_in(base, step_idx), (batch_size,), 0, n
        )
        imgs, labs = images[idx], labels[idx]
        (loss, hit), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, imgs, labs
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "presence_recall": hit}

    return step


def evaluate_presence(
    model: PresenceModel, params, images: np.ndarray, labels: np.ndarray,
    batch_size: int = 32,
) -> dict:
    """Held-out presence quality: BCE loss + recall of positives at 0.5 +
    precision@k where k = per-image positive count."""

    @jax.jit
    def fwd(p, imgs):
        return model.apply({"params": p}, imgs)

    n = images.shape[0]
    tot_loss, tot_hit, tot_pos, tot_prec = 0.0, 0.0, 0, 0.0
    for lo in range(0, n, batch_size):
        imgs = jnp.asarray(images[lo : lo + batch_size])
        labs = labels[lo : lo + batch_size]
        logits = np.asarray(fwd(params, imgs), np.float32)
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
    return {
        "loss": tot_loss / max(n, 1),
        "presence_recall": float(tot_hit) / max(tot_pos, 1),
        "precision_at_k": float(tot_prec) / max(n, 1),
    }


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
