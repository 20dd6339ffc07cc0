"""Preprocess-time feature extraction: images → region features.

Reference capability (SURVEY.md §2.1 #2 and §3.1 hot loop): run every kept VG
image through the conv backbone and dump region features to shards. TPU
redesign: one jitted batched encoder apply per image batch (no per-op
dispatch), bf16 on TPU, PIL-decoded host-side.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sgg.models.encoders import make_encoder, normalize_for


def load_and_resize(path: str, size: int = 224) -> np.ndarray:
    """JPEG/PNG → uint8 [size, size, 3] (RGB). Native C++ decode for JPEGs
    (sgg.native: libjpeg + DCT prescale + threaded batch), PIL otherwise."""
    if path.lower().endswith((".jpg", ".jpeg")):
        try:
            from sgg import native

            return native.decode_file(path, size)
        except Exception:
            pass  # fall through to PIL (non-baseline JPEG, missing toolchain)
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB").resize((size, size), Image.BILINEAR)
        return np.asarray(im, dtype=np.uint8)


def load_batch(paths: list[str], size: int = 224) -> np.ndarray:
    """Batch decode → uint8 [N, size, size, 3]; threaded native path when
    every file is a JPEG and the native loader is available."""
    if paths and all(p.lower().endswith((".jpg", ".jpeg")) for p in paths):
        try:
            from sgg import native

            return native.decode_batch(paths, size)
        except Exception:
            pass
    return np.stack([load_and_resize(p, size) for p in paths])


def resolve_image_paths(
    image_ids: Sequence[int], image_dir: str, exts=(".jpg", ".jpeg", ".png")
) -> list[str]:
    """VG images are stored as ``<image_id>.jpg``; find each, error on gaps."""
    paths, missing = [], []
    for i in image_ids:
        for ext in exts:
            p = os.path.join(image_dir, f"{i}{ext}")
            if os.path.exists(p):
                paths.append(p)
                break
        else:
            missing.append(i)
    if missing:
        raise FileNotFoundError(
            f"{len(missing)} images not found in {image_dir} "
            f"(first few ids: {missing[:5]})"
        )
    return paths


def extract_features(
    encoder_name: str,
    image_paths: Sequence[str],
    encoder_params=None,
    batch_size: int = 32,
    image_size: int = 224,
    use_pallas: bool | None = None,
    dtype=jnp.float32,
    seed: int = 0,
    vit_dims: tuple = (768, 12, 12),
    moe_experts: int = 0,
    moe_top_k: int = 2,
) -> np.ndarray:
    """Batched jitted extraction → float32 [N, R, F].

    ``encoder_params=None`` initializes random weights (pipeline smoke);
    pass loaded pretrained params for real runs.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    enc = make_encoder(
        encoder_name, use_pallas=use_pallas, dtype=dtype,
        image_size=image_size, vit_dims=vit_dims,
        moe_experts=moe_experts, moe_top_k=moe_top_k,
    )
    if enc is None:
        raise ValueError("encoder 'precomputed' cannot extract features")

    sample = jnp.zeros((1, image_size, image_size, 3), dtype)
    if encoder_params is None:
        encoder_params = enc.init(jax.random.key(seed), sample)
    # Commit params to the device ONCE. A numpy pytree (the --encoder-ckpt
    # npz path) would otherwise be re-uploaded on EVERY apply call — ~80 MB
    # of VGG weights per 32-image batch, which dragged extraction from
    # ~50 img/s to 6–12 img/s on the relay before this line existed.
    encoder_params = jax.tree.map(jnp.asarray, encoder_params)

    @jax.jit
    def apply(params, images_u8):
        x = normalize_for(encoder_name, images_u8)
        return enc.apply(params, x).astype(jnp.float32)

    out = []
    n = len(image_paths)
    for lo in range(0, n, batch_size):
        chunk = list(image_paths[lo : lo + batch_size])
        imgs = load_batch(chunk, image_size)
        if imgs.shape[0] < batch_size:  # keep the compiled shape
            pad = np.repeat(imgs[-1:], batch_size - imgs.shape[0], axis=0)
            imgs = np.concatenate([imgs, pad], axis=0)
        feats = np.asarray(apply(encoder_params, jnp.asarray(imgs)))
        out.append(feats[: len(chunk)])
    return np.concatenate(out, axis=0)


def extract_to_shards(
    encoder_name: str,
    image_ids: Sequence[int],
    image_paths: Sequence[str],
    triples_per_image: Sequence[np.ndarray],
    out_dir: str,
    shard_size: int = 1024,
    encoder_params=None,
    batch_size: int = 32,
    image_size: int = 224,
    use_pallas: bool | None = None,
    dtype=jnp.float32,
    feat_dtype=jnp.float32,
    seed: int = 0,
    log_every: int = 50,
    vit_dims: tuple = (768, 12, 12),
    moe_experts: int = 0,
    moe_top_k: int = 2,
    stall_exit_sec: float = 900.0,
) -> dict:
    """Streaming extraction: images → encoder → shards, O(shard) host memory.

    The in-RAM ``extract_features`` path materializes the full [N, R, F]
    array — 43 GB at Visual Genome volume (108k × 196 × 512 f32) — so the
    full-scale preprocess streams instead: a host thread decodes batch i+1
    while the device computes batch i (the relay readback is IO-wait, so
    the single-core host overlaps decode with it), and finished shards are
    written incrementally. Returns {"num_images", "num_shards", "images_per_sec",
    "decode_wait_frac"} — the last one says whether the input pipeline
    (decode) or the device is the bottleneck (SURVEY.md §3.1 HOT LOOP).
    """
    import queue
    import threading
    import time

    from sgg.data.shards import shard_name, write_feature_shard

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    enc = make_encoder(
        encoder_name, use_pallas=use_pallas, dtype=dtype,
        image_size=image_size, vit_dims=vit_dims,
        moe_experts=moe_experts, moe_top_k=moe_top_k,
    )
    if enc is None:
        raise ValueError("encoder 'precomputed' cannot extract features")
    sample = jnp.zeros((1, image_size, image_size, 3), dtype)
    if encoder_params is None:
        encoder_params = enc.init(jax.random.key(seed), sample)
    # Commit params to the device ONCE. A numpy pytree (the --encoder-ckpt
    # npz path) would otherwise be re-uploaded on EVERY apply call — ~80 MB
    # of VGG weights per 32-image batch, which dragged extraction from
    # ~50 img/s to 6–12 img/s on the relay before this line existed.
    encoder_params = jax.tree.map(jnp.asarray, encoder_params)

    @jax.jit
    def apply(params, images_u8):
        # feat_dtype=float16 halves shard storage AND device->host transfer
        # - the extraction bottleneck on relay-attached hosts.
        x = normalize_for(encoder_name, images_u8)
        return enc.apply(params, x).astype(feat_dtype)

    n = len(image_paths)
    os.makedirs(out_dir, exist_ok=True)
    n_shards = max(1, -(-n // shard_size))

    q: "queue.Queue" = queue.Queue(maxsize=4)

    def decode_loop():
        for lo in range(0, n, batch_size):
            chunk = list(image_paths[lo : lo + batch_size])
            imgs = load_batch(chunk, image_size)
            if imgs.shape[0] < batch_size:  # keep the compiled shape
                pad = np.repeat(imgs[-1:], batch_size - imgs.shape[0], axis=0)
                imgs = np.concatenate([imgs, pad], axis=0)
            q.put((lo, len(chunk), imgs))
        q.put(None)

    t = threading.Thread(target=decode_loop, daemon=True)
    t.start()

    buf_feats: list[np.ndarray] = []
    buf_count = 0
    shard_idx = 0
    t0 = time.time()
    decode_wait = 0.0
    done = 0
    pending = None  # (lo, n_valid, device_result) — one batch in flight

    def flush(feats_list, start, count):
        nonlocal shard_idx
        feats = np.concatenate(feats_list, axis=0)[:count]
        ids = np.asarray(image_ids[start : start + count], np.int32)
        trs = [np.asarray(x, np.int32) for x in
               triples_per_image[start : start + count]]
        write_feature_shard(
            os.path.join(out_dir, shard_name(shard_idx, n_shards)),
            ids, feats, trs,
        )
        shard_idx += 1

    # Stall watchdog: the relay can wedge a dispatch/readback forever
    # (0 CPU, no error); extraction is a ~30 min device-bound stage, so a
    # daemon thread exits 86 when no batch readback lands in the window —
    # the supervisor relaunches (and vocab.json written LAST keeps partial
    # output from satisfying the stage guard).
    progress = {"t": time.time()}
    if stall_exit_sec > 0:
        def _stall_watchdog():
            import os as _os

            while True:
                time.sleep(30)
                if time.time() - progress["t"] > stall_exit_sec:
                    print(
                        f"[extract] STALL: no batch readback for "
                        f"{time.time() - progress['t']:.0f}s — exit 86",
                        flush=True,
                    )
                    _os._exit(86)

        threading.Thread(target=_stall_watchdog, daemon=True).start()

    shard_start = 0
    finished = False
    while not finished:
        tw = time.time()
        item = q.get()
        decode_wait += time.time() - tw
        if item is None:
            finished = True
            nxt = None
        else:
            lo, n_valid, imgs = item
            # Dispatch the new batch BEFORE reading back the previous one:
            # the device computes batch i+1 while the host blocks on i's
            # relay readback.
            nxt = (lo, n_valid, apply(encoder_params, jnp.asarray(imgs)))
        if pending is not None:
            _, nv_p, dev = pending
            buf_feats.append(np.asarray(dev)[:nv_p])
            progress["t"] = time.time()
            buf_count += nv_p
            done += nv_p
            while buf_count >= shard_size or (finished and nxt is None and buf_count > 0):
                take = min(shard_size, buf_count)
                flush(buf_feats, shard_start, take)
                rest = np.concatenate(buf_feats, axis=0)[take:]
                buf_feats = [rest] if rest.size else []
                buf_count -= take
                shard_start += take
            if log_every and (done // batch_size) % log_every == 0:
                rate = done / max(time.time() - t0, 1e-9)
                print(
                    f"[extract] {done}/{n} images ({rate:.0f}/s, "
                    f"decode-wait {100 * decode_wait / max(time.time() - t0, 1e-9):.0f}%)",
                    flush=True,
                )
        pending = nxt
    # Drain the final in-flight batch and flush the remainder.
    if pending is not None:
        _, nv_p, dev = pending
        buf_feats.append(np.asarray(dev)[:nv_p])
        buf_count += nv_p
        done += nv_p
    while buf_count > 0:
        take = min(shard_size, buf_count)
        flush(buf_feats, shard_start, take)
        rest = np.concatenate(buf_feats, axis=0)[take:]
        buf_feats = [rest] if rest.size else []
        buf_count -= take
        shard_start += take

    dt = time.time() - t0
    return {
        "num_images": n,
        "num_shards": shard_idx,
        "images_per_sec": round(n / max(dt, 1e-9), 1),
        "decode_wait_frac": round(decode_wait / max(dt, 1e-9), 3),
        "seconds": round(dt, 1),
    }


def extract_vgg_features(
    image_ids: Sequence[int],
    image_dir: str,
    weights_path: str | None = None,
    batch_size: int = 32,
    image_size: int = 224,
) -> np.ndarray:
    """The reference's preprocess hot loop: VGG-19 conv5 features per image."""
    params = None
    if weights_path:
        from sgg.models.vgg import load_npy_weights

        params = load_npy_weights(weights_path)
    paths = resolve_image_paths(image_ids, image_dir)
    return extract_features(
        "vgg19", paths, encoder_params=params,
        batch_size=batch_size, image_size=image_size,
    )
