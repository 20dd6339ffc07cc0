"""Fused Pallas decode kernel — the whole 3-step triple decode in ONE program.

VERDICT r2 weak #1 / item 2: the flagship attention-LSTM decoder is a chain
of tiny matmuls (attention score, LSTM gates, deep-out, vocab projection —
`sgg/models/generator.py`), and the fused WGAN-GP step is latency-bound on
exactly this sequential op-dispatch depth (BASELINE.md "Step MFU across
shapes": MFU flat in batch AND vocab). This kernel collapses the full decode
— Show-Attend-Tell additive attention, TF1-convention LSTM cell, deep-output
+ vocab projection, Gumbel-softmax (relaxed or straight-through forward) and
the embedding feedback — into one Pallas program with every weight resident
in VMEM across the 3-step unroll (vg1k decoder ≈ 8 MB bf16; v5e VMEM is
128 MB, `vmem_limit_bytes` raised accordingly), so the only HBM traffic is
features in, samples out.

Scope: FORWARD-only by design. The two grad-free consumers are the batched
fake sampling inside the critic phase (sgg/train/step.py) and the inference
sampler (sgg/eval/sampler.py). The generator-update phase needs gradients
and keeps the XLA chain (a custom_vjp pairing this forward with the XLA
backward is possible but buys nothing: the backward dominates that phase).

Gumbel noise is an INPUT (`decode_gumbel_noise` reproduces the generator's
exact rng split sequence), so kernel outputs are bit-comparable to
`AttentionLSTMGenerator.apply` given the same key — parity is testable and
the estimator semantics (`hard` straight-through forward = one-hot argmax)
are identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TRIPLE_LEN = 3


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def decode_params_from_generator(g_params: dict) -> dict:
    """Flax AttentionLSTMGenerator param tree → flat arrays for the kernel."""
    att = g_params["AdditiveAttention_0"]
    return {
        "wf": att["feat_proj"]["kernel"],          # [F, A]
        "wh": att["state_proj"]["kernel"],         # [H, A]
        "bh": att["state_proj"]["bias"],           # [A]
        "v": att["score"]["kernel"][:, 0],         # [A]
        "wc": g_params["init_c"]["kernel"],        # [F, H]
        "bc": g_params["init_c"]["bias"],          # [H]
        "wi": g_params["init_h"]["kernel"],        # [F, H]
        "bi": g_params["init_h"]["bias"],          # [H]
        "k": g_params["TF1LSTMCell_0"]["kernel"],  # [F+E+Z+H, 4H]
        "bk": g_params["TF1LSTMCell_0"]["bias"],   # [4H]
        "wd": g_params["deep_out"]["kernel"],      # [H+F, E]
        "bd": g_params["deep_out"]["bias"],        # [E]
        "wv": g_params["vocab_proj"]["kernel"],    # [E, V]
        "bv": g_params["vocab_proj"]["bias"],      # [V]
        "emb": g_params["token_embedding"],        # [V, E]
    }


def decode_gumbel_noise(rng: jax.Array, batch: int, vocab: int) -> jnp.ndarray:
    """[B, 3, V] f32 Gumbel noise with the generator's exact split sequence
    (generator.py: per step `rng, sub = split(rng)` then sample_gumbel)."""
    from sgg.utils.gumbel import sample_gumbel

    out = []
    for _ in range(TRIPLE_LEN):
        rng, sub = jax.random.split(rng)
        out.append(sample_gumbel(sub, (batch, vocab)))
    return jnp.stack(out, axis=1)


def decode_reference(
    params: dict, feats, z, gumbel, tau=1.0, mask_bias=None, hard=True,
    dtype=None,
):
    """Pure-jnp decode with EXPLICIT gumbel noise — numerically identical to
    `AttentionLSTMGenerator.apply` when `gumbel = decode_gumbel_noise(rng)`.
    The kernel's parity target and its gradient-path stand-in."""
    dtype = dtype or feats.dtype
    p = {k: jnp.asarray(v) for k, v in params.items()}
    f = lambda a: a.astype(dtype)
    feats, z = f(feats), f(z)
    B = feats.shape[0]
    E = p["emb"].shape[1]

    mean = feats.mean(axis=1)
    c = jnp.tanh(mean @ f(p["wc"]) + f(p["bc"]))
    h = jnp.tanh(mean @ f(p["wi"]) + f(p["bi"]))
    proj = feats @ f(p["wf"])  # [B, R, A]
    prev = jnp.zeros((B, E), dtype)
    forget_bias = 1.0

    ys = []
    for t in range(TRIPLE_LEN):
        hp = h @ f(p["wh"]) + f(p["bh"])
        s = jnp.tanh(proj + hp[:, None, :]) @ f(p["v"])  # [B, R]
        alpha = jax.nn.softmax(s, axis=-1)
        ctx = jnp.einsum("br,brf->bf", alpha, feats)
        gates = (
            jnp.concatenate([ctx, prev, z, h], axis=-1) @ f(p["k"]) + f(p["bk"])
        )
        i, j, fg, o = jnp.split(gates, 4, axis=-1)
        c = c * jax.nn.sigmoid(fg + forget_bias) + jax.nn.sigmoid(i) * jnp.tanh(j)
        h = jnp.tanh(c) * jax.nn.sigmoid(o)
        dec = jnp.tanh(jnp.concatenate([h, ctx], axis=-1) @ f(p["wd"]) + f(p["bd"]))
        logits = (dec @ f(p["wv"]) + f(p["bv"])).astype(jnp.float32)
        if mask_bias is not None:
            logits = logits + mask_bias[t][None, :]
        y = jax.nn.softmax((logits + gumbel[:, t, :]) / tau, axis=-1)
        if hard:
            y = jax.nn.one_hot(
                jnp.argmax(y, axis=-1), y.shape[-1], dtype=y.dtype
            )
        y = y.astype(dtype)
        prev = y @ f(p["emb"])
        ys.append(y)
    return jnp.stack(ys, axis=1)  # [B, 3, V]


def _decode_kernel(
    feats_ref, z_ref, g_ref, tau_ref, mb_ref,
    wf, wh, bh, vv, wc, bc, wi, bi, kk, bk, wd, bd, wv, bv, emb,
    y_ref, *, hard: bool, n_steps: int,
):
    dtype = feats_ref.dtype
    feats = feats_ref[...]            # [TB, R, F]
    z = z_ref[...]                    # [TB, Z]
    TB, R, F = feats.shape
    E = emb.shape[1]
    H = wc.shape[1]
    V = wv.shape[1]

    f32 = jnp.float32
    mean = feats.astype(f32).mean(axis=1).astype(dtype)
    c = jnp.tanh(jnp.dot(mean, wc[...], preferred_element_type=f32) + bc[...])
    h = jnp.tanh(jnp.dot(mean, wi[...], preferred_element_type=f32) + bi[...])
    c, h = c.astype(dtype), h.astype(dtype)
    proj = jnp.dot(
        feats.reshape(TB * R, F), wf[...], preferred_element_type=f32
    ).astype(dtype).reshape(TB, R, -1)  # [TB, R, A]
    prev = jnp.zeros((TB, E), dtype)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (TB, V), 1)

    for t in range(n_steps):
        hp = (
            jnp.dot(h, wh[...], preferred_element_type=f32) + bh[...]
        ).astype(dtype)
        s = jnp.tanh(proj + hp[:, None, :])  # [TB, R, A]
        scores = jnp.sum(
            s.astype(f32) * vv[...].astype(f32)[None, None, :], axis=-1
        )  # [TB, R] f32
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        alpha = e / jnp.sum(e, axis=-1, keepdims=True)
        ctx = jnp.sum(
            alpha[:, :, None] * feats.astype(f32), axis=1
        ).astype(dtype)  # [TB, F]
        x = jnp.concatenate([ctx, prev, z, h], axis=-1)
        gates = jnp.dot(x, kk[...], preferred_element_type=f32) + bk[...]
        i = gates[:, :H]
        j = gates[:, H : 2 * H]
        fg = gates[:, 2 * H : 3 * H]
        o = gates[:, 3 * H :]
        cf = c.astype(f32) * jax.nn.sigmoid(fg + 1.0) + jax.nn.sigmoid(
            i
        ) * jnp.tanh(j)
        c = cf.astype(dtype)
        h = (jnp.tanh(cf) * jax.nn.sigmoid(o)).astype(dtype)
        dec = jnp.tanh(
            jnp.dot(
                jnp.concatenate([h, ctx], axis=-1), wd[...],
                preferred_element_type=f32,
            )
            + bd[...]
        ).astype(dtype)
        logits = (
            jnp.dot(dec, wv[...], preferred_element_type=f32)
            + bv[...]
            + mb_ref[t][None, :]
        )
        ly = (logits + g_ref[:, t, :]) / tau_ref[0, 0]
        mly = jnp.max(ly, axis=-1, keepdims=True)
        ey = jnp.exp(ly - mly)
        y = ey / jnp.sum(ey, axis=-1, keepdims=True)  # [TB, V] f32
        if hard:
            ymax = jnp.max(y, axis=-1, keepdims=True)
            # Tie-break like argmax: smallest index among maxima.
            first = jnp.min(
                jnp.where(y == ymax, iota_v, V), axis=-1, keepdims=True
            )
            y = jnp.where(iota_v == first, 1.0, 0.0)
        y = y.astype(dtype)
        prev = jnp.dot(y, emb[...], preferred_element_type=f32).astype(dtype)
        y_ref[:, t, :] = y


@functools.partial(
    jax.jit, static_argnames=("hard", "block_b", "interpret")
)
def fused_decode(
    params: dict,
    feats: jnp.ndarray,   # [B, R, F]
    z: jnp.ndarray,       # [B, Z]
    gumbel: jnp.ndarray,  # [B, 3, V] f32
    tau=1.0,
    mask_bias: jnp.ndarray | None = None,  # f32[3, V] additive (0 / -1e9)
    hard: bool = True,
    block_b: int = 32,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """One-program 3-step decode. Returns the sample y [B, 3, V] (one-hot
    when hard — tokens are its argmax)."""
    dtype = feats.dtype
    B, R, F = feats.shape
    V = params["wv"].shape[1]
    if mask_bias is None:
        mask_bias = jnp.zeros((TRIPLE_LEN, V), jnp.float32)
    tau_arr = jnp.full((1, 1), tau, jnp.float32)

    TB = min(block_b, B)
    Bp = ((B + TB - 1) // TB) * TB
    if Bp != B:
        feats = jnp.pad(feats, ((0, Bp - B), (0, 0), (0, 0)))
        z = jnp.pad(z, ((0, Bp - B), (0, 0)))
        gumbel = jnp.pad(gumbel, ((0, Bp - B), (0, 0), (0, 0)))
    nB = Bp // TB

    w_names = [
        "wf", "wh", "bh", "v", "wc", "bc", "wi", "bi", "k", "bk",
        "wd", "bd", "wv", "bv", "emb",
    ]
    weights = [jnp.asarray(params[n]).astype(dtype) for n in w_names]
    # Biases consumed in f32 adds keep f32 (they add onto f32 accumulators).
    for idx, n in enumerate(w_names):
        if n in ("bh", "bc", "bi", "bk", "bd", "bv"):
            weights[idx] = jnp.asarray(params[n]).astype(jnp.float32)

    batch_spec = lambda *shape: pl.BlockSpec(
        shape, lambda b: (b,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM,
    )
    full_spec = lambda a: pl.BlockSpec(
        a.shape, lambda b: (0,) * a.ndim, memory_space=pltpu.VMEM
    )

    kernel = functools.partial(
        _decode_kernel, hard=hard, n_steps=TRIPLE_LEN
    )
    y = pl.pallas_call(
        kernel,
        grid=(nB,),
        in_specs=[
            batch_spec(TB, R, F),
            batch_spec(TB, z.shape[-1]),
            batch_spec(TB, TRIPLE_LEN, V),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
            full_spec(mask_bias),
            *[full_spec(w) for w in weights],
        ],
        out_specs=batch_spec(TB, TRIPLE_LEN, V),
        out_shape=jax.ShapeDtypeStruct((Bp, TRIPLE_LEN, V), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret() if interpret is None else interpret,
    )(feats, z, gumbel, tau_arr, mask_bias, *weights)
    return y[:B]


def step_mask_bias(step_mask: np.ndarray) -> jnp.ndarray:
    """bool[3, V] legality mask → additive f32 bias (0 legal / -1e9 illegal),
    matching generator.py's where(-1e9) masking."""
    return jnp.where(jnp.asarray(step_mask, bool), 0.0, -1e9).astype(jnp.float32)
