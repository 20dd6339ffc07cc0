"""Transformer triple decoder (the modern counterpart of the LSTM decoder).

BASELINE.json:10: transformer triple decoder paired with the ViT encoder.
TPU-first redesign rather than a port: the (subject, predicate, object)
positions are THREE learned slot queries decoded in parallel — one fused
pass of self-attention (3 tokens) + cross-attention over the patch tokens
per layer — instead of a sequential 3-step RNN. Slot conditioning on the
noise vector keeps the GAN's sample diversity; per-slot type masks keep
triples well-formed. Matches the AttentionLSTMGenerator interface exactly,
so the fused train step and sampler are decoder-agnostic.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from sgg.models.generator import TRIPLE_LEN
from sgg.utils.gumbel import gumbel_softmax, sample_gumbel, top_k_top_p_filter


class _CrossAttention(nn.Module):
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_tokens, kv):  # [B,3,E], [B,R,E] → ([B,3,E], [B,3,R])
        B, T, E = q_tokens.shape
        H = self.num_heads
        D = E // H
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        q = nn.Dense(E, name="q", **kw)(q_tokens).reshape(B, T, H, D)
        k = nn.Dense(E, name="k", **kw)(kv).reshape(B, -1, H, D)
        v = nn.Dense(E, name="v", **kw)(kv).reshape(B, -1, H, D)
        s = jnp.einsum("bthd,brhd->bhtr", q, k) * (D**-0.5)
        a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(self.dtype)
        o = jnp.einsum("bhtr,brhd->bthd", a, v).reshape(B, T, E)
        return nn.Dense(E, name="out", **kw)(o), a.mean(axis=1)  # head-avg map


class TransformerTripleGenerator(nn.Module):
    vocab_size: int
    hidden: int = 512  # decoder width
    embed_dim: int = 256  # token embedding width (critic-compatible)
    noise_dim: int = 128
    num_heads: int = 8
    num_layers: int = 4
    mlp_ratio: int = 4
    use_pallas: bool = False  # reserved: cross-attn q-len is 3 (no flash win)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,  # [B, R, F]
        z: jnp.ndarray,  # [B, noise_dim]
        rng: jax.Array,
        tau: float | jnp.ndarray = 1.0,
        hard: bool = False,
        step_mask: jnp.ndarray | None = None,
        detach_sample: bool = False,
        forced_tokens: jnp.ndarray | None = None,  # int32[B, 3]
        forced_steps: tuple = (),  # static: which slots to clamp
        sample_temp: float | jnp.ndarray | None = None,
        sample_top_k: int = 0,  # static: keep k best tokens per slot
        sample_top_p: float | jnp.ndarray | None = None,
    ) -> dict[str, jnp.ndarray]:
        # Interface parity with the LSTM decoder's conditional mode. The
        # slot decoder is NON-autoregressive: clamping a slot replaces its
        # output one-hot but CANNOT condition the other slots' logits (they
        # depend only on the image and z). PredCls through this decoder
        # therefore scores the marginal predicate distribution — documented
        # behavior, asserted in tests.
        feats = feats.astype(self.dtype)
        z = z.astype(self.dtype)
        B = feats.shape[0]
        E = self.hidden
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        kv = nn.Dense(E, name="feat_proj", **kw)(feats)  # [B, R, E]

        slots = self.param(
            "slot_embed", nn.initializers.normal(0.02), (1, TRIPLE_LEN, E),
            self.param_dtype,
        ).astype(self.dtype)
        zc = nn.Dense(E, name="noise_proj", **kw)(z)[:, None, :]
        x = jnp.broadcast_to(slots, (B, TRIPLE_LEN, E)) + zc

        attn_map = None
        for i in range(self.num_layers):
            y = nn.LayerNorm(name=f"ln_self{i}", **kw)(x)
            qkv = nn.Dense(3 * E, name=f"self_qkv{i}", **kw)(y)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            H = self.num_heads
            D = E // H
            s = jnp.einsum(
                "bthd,bshd->bhts",
                q.reshape(B, TRIPLE_LEN, H, D),
                k.reshape(B, TRIPLE_LEN, H, D),
            ) * (D**-0.5)
            a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(self.dtype)
            sa = jnp.einsum(
                "bhts,bshd->bthd", a, v.reshape(B, TRIPLE_LEN, H, D)
            ).reshape(B, TRIPLE_LEN, E)
            x = x + nn.Dense(E, name=f"self_out{i}", **kw)(sa)

            y = nn.LayerNorm(name=f"ln_cross{i}", **kw)(x)
            ca, attn_map = _CrossAttention(
                self.num_heads, name=f"cross{i}", dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(y, kv)
            x = x + ca

            y = nn.LayerNorm(name=f"ln_mlp{i}", **kw)(x)
            h = nn.gelu(nn.Dense(E * self.mlp_ratio, name=f"mlp1_{i}", **kw)(y))
            x = x + nn.Dense(E, name=f"mlp2_{i}", **kw)(h)

        x = nn.LayerNorm(name="ln_out", **kw)(x)
        logits = nn.Dense(self.vocab_size, name="vocab_proj", **kw)(x)  # [B,3,V]
        if step_mask is not None:
            m = jnp.asarray(step_mask, bool)[None, :, :]
            logits = jnp.where(m, logits, jnp.asarray(-1e9, logits.dtype))

        logits32 = logits.astype(jnp.float32)
        # Inference sampling temperature (tokens ~ softmax(logits / temp));
        # see AttentionLSTMGenerator.__call__ — log_prob stays untempered.
        samp32 = logits32 if sample_temp is None else logits32 / sample_temp
        if sample_top_k or sample_top_p is not None:
            # Top-k / nucleus truncation of the tempered per-slot
            # distributions (see AttentionLSTMGenerator.__call__).
            samp32 = top_k_top_p_filter(samp32, sample_top_k, sample_top_p)

        def clamp(y, idx):
            if not forced_steps:
                return y, idx
            fy = jax.nn.one_hot(
                forced_tokens, self.vocab_size, dtype=jnp.float32
            ).astype(self.dtype)
            keep = jnp.asarray(
                [t in forced_steps for t in range(TRIPLE_LEN)], bool
            )[None, :, None]
            y = jnp.where(keep, fy, y)
            idx = jnp.where(keep[..., 0], forced_tokens, idx)
            return y, idx

        if detach_sample:
            # Score-function (REINFORCE) sampling mode — see the LSTM
            # generator's docstring. The slot decoder is non-autoregressive,
            # so the three tokens are independent draws given the slots:
            # log_prob is just the sum of the three per-slot log-softmaxes.
            g = sample_gumbel(rng, logits32.shape, jnp.float32)
            idx = jnp.argmax(samp32 + g, axis=-1)  # [B, 3]
            y = jax.lax.stop_gradient(
                jax.nn.one_hot(idx, self.vocab_size, dtype=jnp.float32)
            ).astype(self.dtype)
            y, idx = clamp(y, idx)
            log_prob = jnp.take_along_axis(
                jax.nn.log_softmax(logits32, axis=-1), idx[..., None], axis=-1
            )[..., 0].sum(axis=-1)  # float32[B]
            return {
                "soft": y,
                "logits": logits,
                "attention": attn_map,
                "tokens": idx,
                "log_prob": log_prob,
            }
        y = gumbel_softmax(rng, samp32, tau=tau, hard=hard).astype(self.dtype)
        y, tokens = clamp(y, jnp.argmax(y, axis=-1))
        return {
            "soft": y,
            "logits": logits,
            "attention": attn_map,  # last layer's head-avg cross-attn [B,3,R]
            "tokens": tokens,
        }
