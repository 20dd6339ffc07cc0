"""Soft (additive) attention over spatial feature regions.

Show-Attend-Tell-style attention, the core of the reference's generator
(SURVEY.md §2.1 #4): score each of R regions against the decoder state,
softmax into weights that sum to 1, return the weighted context vector.

TPU notes: the feature projection ``W_f @ feats`` can be hoisted out of the
decode loop via ``project_features`` (computed once per image, reused for all
3 steps) and both projections are single batched matmuls on the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class AdditiveAttention(nn.Module):
    """score_r = v·tanh(P_r + W_h h); alpha = softmax(score); ctx = Σ alpha_r f_r."""

    attn_dim: int = 256
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.feat_proj = nn.Dense(self.attn_dim, use_bias=False, **kw)
        self.state_proj = nn.Dense(self.attn_dim, **kw)
        self.score = nn.Dense(1, use_bias=False, **kw)

    def project_features(self, feats: jnp.ndarray) -> jnp.ndarray:
        """Per-image projection, hoistable out of the decode loop. [B,R,F]→[B,R,A]."""
        return self.feat_proj(feats)

    def __call__(self, feats, h, proj_feats=None):
        """feats [B,R,F], h [B,H], proj_feats [B,R,A] → (ctx [B,F], alpha [B,R])."""
        if proj_feats is None:
            proj_feats = self.project_features(feats)
        hp = self.state_proj(h)
        scores = self.score(jnp.tanh(proj_feats + hp[:, None, :]))
        alpha = nn.softmax(scores.squeeze(-1), axis=-1)  # [B, R]
        ctx = jnp.einsum("br,brf->bf", alpha, feats)
        return ctx, alpha
