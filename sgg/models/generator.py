"""Attention-LSTM triple generator.

Capability parity with the reference generator (SURVEY.md §2.1 #4): a
Show-Attend-Tell-style decoder that, conditioned on spatial image features
and a noise vector, emits a (subject, predicate, object) triple as three
soft token distributions the critic can differentiate through.

Per decode step t ∈ {subj, pred, obj}:
  1. soft attention over the R feature regions → context vector;
  2. LSTM cell step on [context, prev-token embedding, noise z];
  3. deep-output projection to vocab logits (masked to the type-legal
     sub-vocabulary for step t);
  4. Gumbel-softmax sample → soft token fed back via the embedding table.

TPU-first design choices:
  - the 3-step decode is a static Python unroll (no scan overhead for T=3);
  - the attention feature projection is hoisted out of the loop;
  - all matmuls are batched MXU ops; compute dtype is configurable
    (bfloat16 on TPU) with float32 params.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from sgg.models.attention import AdditiveAttention
from sgg.models.lstm import TF1LSTMCell
from sgg.utils.gumbel import gumbel_softmax, sample_gumbel, top_k_top_p_filter

TRIPLE_LEN = 3  # (subject, predicate, object)


class AttentionLSTMGenerator(nn.Module):
    vocab_size: int
    hidden: int = 512
    embed_dim: int = 256
    attn_dim: int = 256
    noise_dim: int = 128
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
        step_mask: jnp.ndarray | None = None,  # bool[3, V] from Vocab.step_mask()
        detach_sample: bool = False,
        forced_tokens: jnp.ndarray | None = None,  # int32[B, 3]
        forced_steps: tuple = (),  # static: which steps to clamp
        sample_temp: float | jnp.ndarray | None = None,
        sample_top_k: int = 0,  # static: keep k best tokens per step
        sample_top_p: float | jnp.ndarray | None = None,
    ) -> dict[str, jnp.ndarray]:
        """Decode one triple per image.

        ``sample_temp`` is the INFERENCE sampling temperature: tokens are
        drawn from Categorical(softmax(masked logits / sample_temp)).
        ``None`` ≡ 1.0 (the model's own distribution). It is distinct from
        ``tau``, the Gumbel-softmax RELAXATION temperature, which shapes
        gradients but — by argmax invariance — never changes which token a
        ``hard=True`` forward pass emits (asserted in tests/unit/
        test_models.py). Reported ``log_prob`` is always the UNtempered
        (temp-1) model joint, the quantity ranking wants.

        ``sample_top_k``/``sample_top_p`` filter each step's TEMPERED
        sampling distribution (top-k truncation, then nucleus top-p —
        sgg.utils.gumbel.top_k_top_p_filter) before the draw; the filters'
        presence is static (off = zero extra ops), the p value is traced.
        Like ``sample_temp`` they never touch the returned ``logits`` or
        ``log_prob``. Inference knobs — training leaves both off.

        ``detach_sample=True`` is the score-function (REINFORCE) sampling
        mode: tokens are exact categorical draws via gumbel-max, the one-hot
        fed back through the embedding is ``stop_gradient``-ed (the sampled
        prefix is a CONSTANT of the autoregressive factorization — only the
        embedding table itself keeps gradients through later steps), and the
        output gains ``log_prob`` — float32[B], Σₜ log πₜ(tokenₜ | prefix).
        ``tau``/``hard`` are inert in this mode.

        ``forced_steps``/``forced_tokens`` clamp decode steps to given ids
        (conditional decoding): at each step t in ``forced_steps`` the
        sampled output is replaced by one_hot(forced_tokens[:, t]), which is
        what feeds back through the embedding — later steps genuinely
        condition on the clamp (the decode is autoregressive). This is the
        PredCls evaluation primitive: clamp subject (+object), read the
        predicate step's logits. The per-step rng splits are unchanged, so
        unforced steps draw the same noise as an unforced call with the
        same key.
        """
        feats = feats.astype(self.dtype)
        z = z.astype(self.dtype)
        B = feats.shape[0]

        attention = AdditiveAttention(
            self.attn_dim, dtype=self.dtype, param_dtype=self.param_dtype
        )
        cell = TF1LSTMCell(
            self.hidden, dtype=self.dtype, param_dtype=self.param_dtype
        )
        embedding = self.param(
            "token_embedding",
            nn.initializers.normal(0.01),
            (self.vocab_size, self.embed_dim),
            self.param_dtype,
        ).astype(self.dtype)

        # Show-Attend-Tell init: LSTM state from the mean image feature.
        mean_feat = feats.mean(axis=1)
        c = jnp.tanh(
            nn.Dense(self.hidden, name="init_c", dtype=self.dtype,
                     param_dtype=self.param_dtype)(mean_feat)
        )
        h = jnp.tanh(
            nn.Dense(self.hidden, name="init_h", dtype=self.dtype,
                     param_dtype=self.param_dtype)(mean_feat)
        )

        # Output layers are shared across the 3 decode steps — define once.
        deep_out = nn.Dense(self.embed_dim, name="deep_out", dtype=self.dtype,
                            param_dtype=self.param_dtype)
        vocab_proj = nn.Dense(self.vocab_size, name="vocab_proj",
                              dtype=self.dtype, param_dtype=self.param_dtype)

        proj_feats = attention.project_features(feats)  # hoisted out of loop
        prev_emb = jnp.zeros((B, self.embed_dim), self.dtype)  # <bos> = zeros

        if step_mask is not None:
            step_mask = jnp.asarray(step_mask, bool)

        soft_steps, logit_steps, attn_steps, logp_steps = [], [], [], []
        for t in range(TRIPLE_LEN):
            ctx, alpha = attention(feats, h, proj_feats)
            x = jnp.concatenate([ctx, prev_emb, z], axis=-1)
            (c, h), _ = cell((c, h), x)
            # Deep output: logits from decoder state + attended context.
            dec = jnp.tanh(deep_out(jnp.concatenate([h, ctx], axis=-1)))
            logits = vocab_proj(dec)
            if step_mask is not None:
                logits = jnp.where(step_mask[t][None, :], logits,
                                   jnp.asarray(-1e9, logits.dtype))
            rng, sub = jax.random.split(rng)
            logits32 = logits.astype(jnp.float32)
            samp32 = logits32 if sample_temp is None else logits32 / sample_temp
            if sample_top_k or sample_top_p is not None:
                samp32 = top_k_top_p_filter(
                    samp32, sample_top_k, sample_top_p
                )
            if t in forced_steps:
                idx = forced_tokens[:, t]
                y = jax.nn.one_hot(
                    idx, self.vocab_size, dtype=jnp.float32
                ).astype(self.dtype)
                if detach_sample:
                    # conditional likelihood of the clamped token
                    logp_steps.append(
                        jnp.take_along_axis(
                            jax.nn.log_softmax(logits32, axis=-1),
                            idx[:, None], axis=-1,
                        )[:, 0]
                    )
            elif detach_sample:
                # Gumbel-max: argmax(logits + g) is an EXACT draw from
                # Categorical(softmax(logits)) — no relaxation, no tau.
                g = sample_gumbel(sub, logits32.shape, jnp.float32)
                idx = jnp.argmax(samp32 + g, axis=-1)
                y = jax.lax.stop_gradient(
                    jax.nn.one_hot(idx, self.vocab_size, dtype=jnp.float32)
                ).astype(self.dtype)
                logp_steps.append(
                    jnp.take_along_axis(
                        jax.nn.log_softmax(logits32, axis=-1),
                        idx[:, None], axis=-1,
                    )[:, 0]
                )
            else:
                y = gumbel_softmax(sub, samp32, tau=tau,
                                   hard=hard).astype(self.dtype)
            prev_emb = y @ embedding
            soft_steps.append(y)
            logit_steps.append(logits)
            attn_steps.append(alpha)

        soft = jnp.stack(soft_steps, axis=1)  # [B, 3, V]
        out = {
            "soft": soft,
            "logits": jnp.stack(logit_steps, axis=1),
            "attention": jnp.stack(attn_steps, axis=1),  # [B, 3, R]
            "tokens": jnp.argmax(soft, axis=-1),  # [B, 3] int
        }
        if detach_sample:
            out["log_prob"] = sum(logp_steps)  # float32[B]
        return out
