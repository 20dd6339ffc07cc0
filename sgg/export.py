"""AOT model export: a trained sampler → one self-contained artifact file.

Reference equivalent: NONE — the reference's deployment story stops at
``tf.train.Saver`` checkpoints, which need the full model code (and the
exact TF1 graph-building script) to restore. This tier packages the
compiled INFERENCE PROGRAM itself via ``jax.export`` (StableHLO): the
artifact is loadable and callable with jax + numpy alone — no sgg model
definitions, no flax, no config system — which is what a serving fleet
actually wants to ship.

TPU-native design points:

- **The program is the artifact.** ``jax.export`` serializes the lowered
  StableHLO with shape/dtype/platform calling conventions; XLA re-compiles
  it for the target chip at load. Model-code drift cannot skew serving.
- **Params ride as ARGUMENTS, not baked constants** — two reasons: the
  artifact stays inspectable/swappable (same program, updated weights),
  and this machine's relay remote-compile rejects huge program constants
  outright (NOTES.md machine facts; BASELINE.md "pass big arrays as jit
  ARGUMENTS").
- **Multi-platform lowering**: one artifact can carry both 'cpu' and 'tpu'
  lowerings (``--platforms cpu,tpu``) so the same file smoke-tests on a
  dev host and serves on chips.
- **RNG is explicit**: the exported entry takes raw uint32 key data (from
  ``jax.random.key_data``) — typed PRNG keys don't cross the export ABI.

File format: one ``.npz`` — ``__module__`` (serialized Exported bytes),
``param0..N`` (generator weights, float32), ``meta`` (JSON: shapes, vocab
tokens, sampling settings). Entry point contract::

    tokens_int32[B, K, 3] = call(params_tuple, feats[B, R, F], key_data)

Usage:
    python -m sgg.cli.export --workdir /runs/vg1k --out model.sgx --check
    call, meta = sgg.export.load_artifact("model.sgx")   # serving host
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from sgg.config import Config
from sgg.eval.sampler import make_sampler

ARTIFACT_VERSION = 1


def export_sampler(
    cfg: Config,
    vocab,
    g_params,
    *,
    enc_params=None,
    quant: str = "",
    batch_size: int = 32,
    num_samples: int = 50,
    temperature: float | None = None,
    platforms: tuple[str, ...] = ("cpu", "tpu"),
):
    """Lower the k-sample triple decoder to StableHLO.

    Returns ``(exported, params_flat, meta)`` — feed to :func:`save_artifact`.
    The exported entry takes ``(params_tuple, x, key_data)`` with static
    shapes (one compiled program serves every request size via padding,
    exactly like the serving tier — sgg/serve.py docstring). Two modes:

    - features in (default): ``x = feats[batch, regions, feat_dim]``.
    - pixels in (``enc_params`` given, encoder configs): the frozen
      backbone — optionally int8-PTQ'd (``quant='int8'``,
      sgg.kernels.quant) — runs INSIDE the artifact;
      ``x = images uint8[batch, H, W, 3]``. This is the reference's whole
      capability (images → scene graphs, SURVEY.md §3.3) as one file.

    ``batch_size=0`` exports a SHAPE-POLYMORPHIC program (symbolic batch
    dim): the consumer calls it at any batch. XLA still compiles once per
    distinct concrete size at call time — through this relay that is
    20–40 s per new size — so serving hosts should still pad to one batch
    (ArtifactEngine does); polymorphism buys the consumer the choice of
    that batch without re-exporting.
    """
    from jax import export as jexport

    sampler = make_sampler(
        cfg, step_mask=vocab.step_mask(), num_samples=num_samples,
        tau=temperature,
    )
    with_encoder = enc_params is not None and cfg.model.encoder != "precomputed"
    if batch_size == 0:
        (bdim,) = jexport.symbolic_shape("batch")
    else:
        bdim = int(batch_size)

    def f32(tree):
        return jax.tree.map(lambda p: jnp.asarray(p, jnp.float32), tree)

    if with_encoder:
        from sgg.models.encoders import make_encoder, normalize_for

        enc = make_encoder(
            cfg.model.encoder, dtype=cfg.model.dtype,
            image_size=cfg.data.image_size,
            moe_experts=cfg.model.moe_experts,
            moe_top_k=cfg.model.moe_top_k, quant=quant,
            vit_dims=cfg.model.vit_dims,
        )
        params_flat, treedef = jax.tree.flatten(
            (f32(enc_params), f32(g_params))
        )

        def fn(flat, images_u8, key_data):
            eparams, gparams = jax.tree.unflatten(treedef, list(flat))
            feats = enc.apply(eparams,
                              normalize_for(cfg.model.encoder, images_u8))
            return sampler(gparams, feats,
                           jax.random.wrap_key_data(key_data))

        s = cfg.data.image_size
        x_s = jax.ShapeDtypeStruct((bdim, s, s, 3), jnp.uint8)
    else:
        params_flat, treedef = jax.tree.flatten(f32(g_params))

        def fn(flat, feats, key_data):
            params = jax.tree.unflatten(treedef, list(flat))
            return sampler(params, feats, jax.random.wrap_key_data(key_data))

        x_s = jax.ShapeDtypeStruct(
            (bdim, cfg.data.regions, cfg.data.feat_dim), cfg.model.dtype
        )
    kd = jax.random.key_data(jax.random.key(0))
    flat_s = tuple(jax.ShapeDtypeStruct(p.shape, p.dtype) for p in params_flat)
    exported = jexport.export(jax.jit(fn), platforms=tuple(platforms))(
        flat_s, x_s, jax.ShapeDtypeStruct(kd.shape, kd.dtype)
    )
    meta = {
        "artifact_version": ARTIFACT_VERSION,
        "input": "images" if with_encoder else "features",
        "encoder": cfg.model.encoder if with_encoder else "",
        "quant": quant if with_encoder else "",
        "image_size": int(cfg.data.image_size) if with_encoder else 0,
        "batch_size": int(batch_size),
        "num_samples": int(num_samples),
        "regions": int(cfg.data.regions),
        "feat_dim": int(cfg.data.feat_dim),
        "feats_dtype": cfg.model.compute_dtype,
        "temperature": 1.0 if temperature is None else float(temperature),
        "platforms": list(platforms),
        "vocab_tokens": list(vocab.tokens),
        "vocab_is_object": [bool(b) for b in vocab.is_object],
        "vocab_is_predicate": [bool(b) for b in vocab.is_predicate],
    }
    return exported, params_flat, meta


def save_artifact(path: str, exported, params_flat, meta: dict) -> None:
    """One .npz: serialized StableHLO module + weights + JSON meta."""
    arrays = {
        "__module__": np.frombuffer(exported.serialize(), np.uint8),
        "meta": np.asarray(json.dumps(meta)),
    }
    for i, p in enumerate(params_flat):
        arrays[f"param{i}"] = np.asarray(p, np.float32)
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_artifact(path: str):
    """Artifact → ``(call, meta)``; needs only jax + numpy.

    ``call(x, key_data)`` → ``tokens int32[B,K,3]`` where ``x`` is
    ``feats[B,R,F]`` (``meta['input']=='features'``) or
    ``images uint8[B,H,W,3]`` (``'images'`` — the encoder runs inside the
    artifact). ``meta`` carries the vocab (``vocab_tokens``) so a consumer
    can map ids to (subject, predicate, object) strings without any sgg
    code.
    """
    from jax import export as jexport

    z = np.load(path, allow_pickle=False)
    exported = jexport.deserialize(z["__module__"].tobytes())
    meta = json.loads(str(z["meta"]))
    n = sum(1 for k in z.files if k.startswith("param"))
    params = tuple(
        jnp.asarray(z[f"param{i}"]) for i in range(n)
    )

    def call(feats, key_data):
        return exported.call(params, feats, key_data)

    return call, meta


def decode_tokens(tokens, meta: dict) -> list[list[tuple[str, str, str]]]:
    """int32[B,K,3] + artifact meta → per-image triple strings (the
    no-sgg-needed consumer path; mirrors Vocab.token)."""
    toks = meta["vocab_tokens"]
    out = []
    for row in np.asarray(tokens):
        out.append([(toks[int(s)], toks[int(p)], toks[int(o)])
                    for s, p, o in row])
    return out
