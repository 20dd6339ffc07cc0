"""Train state: generator + critic params, optimizer states, step, RNG.

Replaces the reference's ``tf.train.Saver``-managed session variables
(SURVEY.md §2.1 #7) with one immutable pytree — the unit that orbax
checkpoints and that the fused step threads through scan.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from sgg.config import Config
from sgg.models import AttentionLSTMGenerator, TripleCritic


@flax.struct.dataclass
class GANTrainState:
    step: jnp.ndarray  # int32 scalar
    g_params: Any
    d_params: Any
    g_opt_state: Any
    d_opt_state: Any
    rng: jax.Array  # base key; per-step keys are folded from this + step
    # Backbone weights for end-to-end (on-device features) configs; None
    # when features are precomputed. Frozen unless train.train_encoder.
    enc_params: Any = None
    # EMA of g_params (train.ema_decay > 0), used at inference via --ema.
    # None when EMA is off — an empty pytree node, so checkpoints written
    # before this field existed restore unchanged.
    g_ema: Any = None
    # Adam state for enc_params (train.train_encoder only); same None-node
    # back-compat contract as g_ema.
    enc_opt_state: Any = None


def make_models(cfg: Config):
    """Build generator + critic modules from config (decoder selected here)."""
    m = cfg.model
    if m.decoder == "lstm":
        gen = AttentionLSTMGenerator(
            vocab_size=m.vocab_size,
            hidden=m.hidden,
            embed_dim=m.embed_dim,
            attn_dim=m.attn_dim,
            noise_dim=m.noise_dim,
            dtype=m.dtype,
        )
    elif m.decoder == "transformer":
        from sgg.models.transformer import TransformerTripleGenerator

        gen = TransformerTripleGenerator(
            vocab_size=m.vocab_size,
            hidden=m.hidden,
            embed_dim=m.embed_dim,
            noise_dim=m.noise_dim,
            num_heads=m.num_heads,
            num_layers=m.num_layers,
            mlp_ratio=m.mlp_ratio,
            dtype=m.dtype,
            use_pallas=m.use_pallas,
        )
    else:
        raise ValueError(f"unknown decoder {m.decoder!r}")
    critic = TripleCritic(
        vocab_size=m.vocab_size,
        embed_dim=m.embed_dim,
        hidden=m.critic_hidden,
        attn_dim=m.attn_dim,
        n_layers=m.critic_layers,
        dtype=m.dtype,
    )
    return gen, critic


def lr_schedule_fn(cfg: Config, peak: float, updates_per_step: int):
    """Build count→lr for one optimizer, or None when both knobs are off.

    optax counts UPDATE calls, not train steps: the critic's Adam sees
    ``n_critic`` updates per fused train step (the scan in
    sgg/train/step.py) while the generator's sees one. ``updates_per_step``
    rescales warmup/decay horizons so every optimizer's schedule tracks the
    same wall-step clock. Returning None keeps the historical plain-float
    lr — optax then uses a stateless scale, so the optimizer-state pytree
    (and every existing checkpoint) is unchanged when schedules are off.
    """
    t = cfg.train
    if t.lr_schedule == "constant" and t.warmup_steps <= 0:
        return None
    if t.lr_schedule not in ("constant", "cosine", "linear"):
        raise ValueError(
            f"unknown train.lr_schedule {t.lr_schedule!r} "
            "(constant | cosine | linear)"
        )
    warm = float(max(t.warmup_steps, 0) * updates_per_step)
    total = float(max(t.total_steps, 1) * updates_per_step)
    end = peak * t.lr_final_frac
    kind = t.lr_schedule

    def sched(count):
        c = jnp.asarray(count, jnp.float32)
        warm_lr = peak * (c + 1.0) / jnp.maximum(warm, 1.0)
        frac = jnp.clip(
            (c - warm) / jnp.maximum(total - warm, 1.0), 0.0, 1.0
        )
        if kind == "cosine":
            decay = end + (peak - end) * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
        elif kind == "linear":
            decay = peak + (end - peak) * frac
        else:  # constant after warmup
            decay = jnp.asarray(peak, jnp.float32)
        return jnp.where(c < warm, warm_lr, decay)

    return sched


def _make_tx(cfg: Config, peak: float,
             updates_per_step: int) -> optax.GradientTransformation:
    t = cfg.train
    sched = lr_schedule_fn(cfg, peak, updates_per_step)
    tx = optax.adam(peak if sched is None else sched, b1=t.beta1, b2=t.beta2)
    if t.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(t.grad_clip), tx)
    return tx


def make_optimizers(cfg: Config) -> tuple[optax.GradientTransformation, optax.GradientTransformation]:
    t = cfg.train
    g_tx = _make_tx(cfg, t.g_lr, 1)
    d_tx = _make_tx(cfg, t.d_lr, t.n_critic)
    return g_tx, d_tx


def make_encoder_optimizer(cfg: Config) -> optax.GradientTransformation:
    # The encoder updates inside the critic scan → n_critic updates/step.
    return _make_tx(cfg, cfg.train.enc_lr, cfg.train.n_critic)


def create_train_state(
    cfg: Config, rng: jax.Array, enc_params: Any = None
) -> GANTrainState:
    """Build a fresh state. For end-to-end encoder configs, pass pretrained
    ``enc_params`` (or leave None to initialize randomly)."""
    from sgg.models.encoders import make_encoder

    gen, critic = make_models(cfg)
    g_tx, d_tx = make_optimizers(cfg)
    B, R, F = 2, cfg.data.regions, cfg.data.feat_dim
    feats = jnp.zeros((B, R, F), cfg.model.dtype)
    z = jnp.zeros((B, cfg.model.noise_dim), cfg.model.dtype)
    r_init, r_gen, r_critic, r_enc, r_state = jax.random.split(rng, 5)
    g_vars = gen.init(r_init, feats, z, r_gen)
    fake = jnp.full((B, 3, cfg.model.vocab_size), 1.0 / cfg.model.vocab_size)
    d_vars = critic.init(r_critic, feats, fake)
    g_params, d_params = g_vars["params"], d_vars["params"]

    encoder = make_encoder(
        cfg.model.encoder, dtype=cfg.model.dtype,
        image_size=cfg.data.image_size,
        moe_experts=cfg.model.moe_experts, moe_top_k=cfg.model.moe_top_k,
        vit_dims=cfg.model.vit_dims,
    )
    if encoder is not None and enc_params is None:
        img = jnp.zeros(
            (1, cfg.data.image_size, cfg.data.image_size, 3), cfg.model.dtype
        )
        # Keep only 'params' — MoE blocks sow an aux-loss scalar into a
        # 'moe' collection at init, which has no place in the train state.
        enc_params = {"params": encoder.init(r_enc, img)["params"]}

    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        g_opt_state=g_tx.init(g_params),
        d_opt_state=d_tx.init(d_params),
        rng=r_state,
        enc_params=enc_params,
        # jnp.copy, not an alias: the fused step donates the whole state, and
        # two leaves sharing one buffer trip XLA's double-donation check.
        g_ema=(
            jax.tree.map(jnp.copy, g_params)
            if cfg.train.ema_decay > 0 else None
        ),
        enc_opt_state=(
            make_encoder_optimizer(cfg).init(enc_params)
            if cfg.train.train_encoder and enc_params is not None
            else None
        ),
    )


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
