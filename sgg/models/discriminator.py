"""Wasserstein critic over (image features, triple) pairs.

Capability parity with the reference discriminator (SURVEY.md §2.1 #5):
scores a triple against the image context. The triple arrives as three
distributions over the vocabulary — exact one-hots for real data, soft
Gumbel-softmax points for generated data — and is embedded by a matmul with
the embedding table, which is differentiable in both cases.

Architecture: per-token embeddings → triple-conditioned additive attention
pool over the image regions → MLP trunk → scalar score. No sigmoid (it is a
Wasserstein critic) and no batch-norm (invalid under WGAN-GP's per-sample
gradient penalty); LayerNorm instead.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class TripleCritic(nn.Module):
    vocab_size: int
    embed_dim: int = 256
    hidden: int = 512
    attn_dim: int = 256
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, triple: jnp.ndarray) -> jnp.ndarray:
        """feats [B, R, F], triple [B, 3, V] (rows on the simplex) → [B]."""
        feats = feats.astype(self.dtype)
        triple = triple.astype(self.dtype)

        embedding = self.param(
            "token_embedding",
            nn.initializers.normal(0.01),
            (self.vocab_size, self.embed_dim),
            self.param_dtype,
        ).astype(self.dtype)
        emb = jnp.einsum("btv,ve->bte", triple, embedding)  # [B, 3, E]
        triple_vec = emb.reshape(emb.shape[0], -1)  # [B, 3E]

        # Triple-conditioned attention pooling of the image regions.
        q = nn.Dense(self.attn_dim, name="query_proj", dtype=self.dtype,
                     param_dtype=self.param_dtype)(triple_vec)
        k = nn.Dense(self.attn_dim, use_bias=False, name="key_proj",
                     dtype=self.dtype, param_dtype=self.param_dtype)(feats)
        scores = nn.Dense(1, use_bias=False, name="score", dtype=self.dtype,
                          param_dtype=self.param_dtype)(
            jnp.tanh(k + q[:, None, :])
        ).squeeze(-1)
        alpha = nn.softmax(scores, axis=-1)  # [B, R]
        ctx = jnp.einsum("br,brf->bf", alpha, feats)

        x = jnp.concatenate([ctx, triple_vec], axis=-1)
        for i in range(self.n_layers):
            x = nn.Dense(self.hidden, name=f"trunk_{i}", dtype=self.dtype,
                         param_dtype=self.param_dtype)(x)
            x = nn.LayerNorm(name=f"ln_{i}", dtype=self.dtype,
                             param_dtype=self.param_dtype)(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        score = nn.Dense(1, name="head", dtype=self.dtype,
                         param_dtype=self.param_dtype)(x)
        return score.squeeze(-1).astype(jnp.float32)
