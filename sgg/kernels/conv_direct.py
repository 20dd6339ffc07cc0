"""Direct conv+BN+ReLU Pallas kernel — patches formed in VMEM, no HBM im2col.

The im2col formulation (conv.py) is bandwidth-bound: it materializes the
kh·kw-times-blown-up patch matrix in HBM before the matmul (measured ~35
TFLOP/s vs XLA's ~190 at VGG shapes). This kernel assembles the patch
matrix on-chip instead:

  - input row-blocks [TB, TH+2ph, Wp, C] are DMA'd HBM→VMEM by the kernel,
    double-buffered so the fetch of the next block overlaps this block's
    matmuls;
  - the kw width taps are packed into the matmul K dim by kw column-shifted
    VMEM stores into a patch buffer [TB, TH+2ph, Wa, kw·C] (one store per
    tap over ALL rows — Mosaic lowers the sublane-offset slices through the
    store path; shifted-DMA and direct concat of offset slices both fail
    layout constraints, see bottom note);
  - the kh kernel-row taps then cost nothing: tap dh is a leading-dim
    (untiled) slice [:, dh:dh+TH] of that buffer, so the conv reduces to kh
    layout-free matmuls [TB·TH·Wa, kw·C] @ [kw·C, TN] on the MXU;
  - the N-tile grid dim is OUTERMOST so the multi-MB weight block streams
    nN times total, not once per row-block (with it innermost, conv4-shape
    weight refetch alone exceeded the matmul time);
  - bias / folded-BN scale / ReLU run in the epilogue before the single
    HBM write of the output tile.

HBM traffic is therefore ~read-x (+halo, ×nN) + read-w·nN + write-y —
near the conv roofline — instead of im2col's (kh·kw+1)× read + 2× write.

MEASURED VERDICT (v5e bf16, benchmarks/bench_kernels.py, marginal-scan
timing): 131/149/153 TFLOP/s at VGG conv3/4/5 shapes ([32,56,56,256],
[32,28,28,512], [32,14,14,512]) vs XLA conv's 175–190. That is 3.7–4.3×
the im2col Pallas path, but the XLA conv emitter runs at ~96% MFU on these
compute-bound shapes and stays ahead: this kernel's irreducible ~14%
width-alignment padding (W=14/28/56 → Wa=16/32/64 sublane tiles) plus
residual per-step overhead cap it at ~0.8× XLA. `conv.py`'s 'auto' mode
therefore routes production convs to XLA — honestly, per the measured
table — and this kernel stays available as impl='direct' and as the
fastest *Pallas* conv for backends/shapes where the trade flips.
Ablations recorded: assembling via column-shifted DMA hit Mosaic's
"tile index divisible by tiling (8)" wall (sublane DMA offsets must be
8-aligned); value-concat of the kh taps into one K=kh·kw·C dot
(fold_kh=True) measured slightly WORSE than kh separate accumulating dots
(126.7/141.8/149.1 vs 130.6/149.0/153.3) — the concat materialization
costs more than the f32 accumulator traffic it saves; per-(dh,dw)
assembly (9 stores/block instead of kw) measured 118–149.

Scope: stride-1 SAME convs (the hot VGG-19 conv stack and the 3×3 ResNet
bottleneck convs; reference capability per SURVEY.md §2.1 #2). Strided and
VALID convs route to XLA in conv.py's dispatcher. Forward-only by design:
encoders are frozen feature extractors in every shipped config; a training
caller gets gradients via conv.py's XLA path.

Alignment strategy (Mosaic layout rules): the width axis sits in sublanes,
channels in lanes. All reshapes collapse (TB, TH, Wa) leading dims over an
aligned (sublane-multiple) Wa and a 128-multiple C, so they are
layout-preserving. Sublane (width-axis) slice offsets must be 8-aligned
for DMA/memref slicing — the reason taps shift via stores, not DMA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _sublane(dtype) -> int:
    return 16 if jnp.dtype(dtype).itemsize == 2 else 8


def _pick_th(H: int, W: int, target_rows: int = 1024) -> int:
    """Rows per block: a divisor of H keeping the matmul M-dim near target."""
    want = max(1, target_rows // max(W, 1))
    if want >= H:
        return H
    best = 1
    for d in range(1, H + 1):
        if H % d == 0 and d <= want:
            best = d
    return best


def _conv_kernel(
    x_hbm, w_ref, scale_ref, bias_ref, out_ref, x_buf, a_buf, sems, *,
    TB, TH, THp, Wa, W_out, kh, kw, Cp, relu, n_bi, nN, nH, fold_kh,
):
    # Grid is (nN, nB, nH): the N tile is OUTERMOST so the (potentially
    # multi-MB) weight block is fetched nN times total rather than once per
    # row-block — with it innermost, conv4-shape weight refetch alone
    # (2.25 MB × every grid step) exceeds the matmul time.
    j = pl.program_id(0)
    b = pl.program_id(1)
    i = pl.program_id(2)
    bi = b * nH + i
    # Slot parity MUST come from the GLOBAL step (j·n_bi + bi), not the
    # per-sweep bi: the wrap prefetch at a sweep's end lands in
    # 1−(step%2), and with odd n_bi that is only the next sweep's slot 0
    # if the parity carries across the sweep boundary. Deriving it from
    # bi alone deadlocks on TPU for odd n_bi with nN>1 (e.g. the
    # [2,14,14,512]→512 parity shape: n_bi=1, nN=2) — the next sweep
    # waits on sems[slot] that the wrap prefetch never signals.
    # Verified ON-CHIP post-fix (round 3): both odd-n_bi parity shapes
    # run to completion at rel err ≤1.5e-3 bf16 — no deadlock.
    step = j * n_bi + bi
    slot = jax.lax.rem(step, 2)

    def dma(bi_idx, slot_idx):
        bb = bi_idx // nH
        ii = jax.lax.rem(bi_idx, nH)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(bb * TB, TB), pl.ds(ii * TH, THp)],
            x_buf.at[slot_idx],
            sems.at[slot_idx],
        )

    @pl.when(step == 0)
    def _():
        dma(0, 0).start()

    # Prefetch the next step's row-block (wrapping to block 0 at the end of
    # each N sweep) so the fetch hides under this step's matmul.
    nxt = jax.lax.rem(bi + 1, n_bi)
    @pl.when((bi + 1 < n_bi) | (j + 1 < nN))
    def _():
        dma(nxt, 1 - slot).start()

    dma(bi, slot).wait()
    # Assemble the patch matrix: kw column-shifted VMEM stores over ALL THp
    # rows pack the width taps into the lane (K) dim. The kh height taps
    # then cost nothing — each is a leading-dim slice of this buffer.
    xb = x_buf[slot]  # [TB, THp, Wp, Cp]
    for dw in range(kw):
        a_buf[:, :, :, dw * Cp : (dw + 1) * Cp] = xb[:, :, dw : dw + Wa, :]

    M = TB * TH * Wa
    if fold_kh:
        # Single dot with K = kh·kw·Cp: the kh taps are leading-dim slices
        # of the patch buffer concatenated along K (all offset-0 layouts, so
        # the concat is legal), letting the MXU accumulate across all taps
        # without spilling a partial f32 accumulator to VMEM between dots.
        a = jnp.concatenate(
            [a_buf[:, dh : dh + TH].reshape(M, kw * Cp) for dh in range(kh)],
            axis=-1,
        )
        acc = jnp.dot(a, w_ref[:], preferred_element_type=jnp.float32)
    else:
        acc = jnp.zeros((M, out_ref.shape[-1]), jnp.float32)
        for dh in range(kh):
            a = a_buf[:, dh : dh + TH].reshape(M, kw * Cp)
            acc = acc + jnp.dot(
                a, w_ref[pl.ds(dh * kw * Cp, kw * Cp)],
                preferred_element_type=jnp.float32,
            )
    y = acc * scale_ref[:] + bias_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    y = y.reshape(TB, TH, Wa, -1)[:, :, :W_out, :]
    out_ref[:] = y.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("relu", "block_n", "block_rows", "out_dtype", "fold_kh"),
)
def conv2d_direct(
    x: jnp.ndarray,  # [B, H, W, Cin]
    w: jnp.ndarray,  # [kh, kw, Cin, Cout] (HWIO)
    bias: jnp.ndarray | None = None,  # [Cout]
    scale: jnp.ndarray | None = None,  # [Cout] folded-BN scale
    relu: bool = True,
    block_n: int = 256,
    block_rows: int = 1024,
    out_dtype=None,
    fold_kh: bool = False,
) -> jnp.ndarray:
    """relu(scale · conv_same_s1(x, w) + bias) in one Pallas kernel."""
    B, H, W, C = x.shape
    kh, kw, C2, N = w.shape
    assert C == C2, (x.shape, w.shape)
    assert kh % 2 == 1 and kw % 2 == 1, "SAME stride-1 kernel must be odd"
    out_dtype = out_dtype or x.dtype
    ph, pw = kh // 2, kw // 2
    sub = _sublane(x.dtype)
    isz = jnp.dtype(x.dtype).itemsize

    Cp = _round_up(C, 128)
    TN = min(block_n, _round_up(N, 128))
    Np = _round_up(N, TN)
    # Width of the A matrix: sublane-aligned so the (TB,TH,Wa)->M collapse is
    # layout-preserving; covers W real outputs plus alignment slack.
    Wa = _round_up(W, sub)
    Wp = _round_up(Wa + 2 * pw, sub)  # padded input width incl. halo

    def plan(rows):
        th = _pick_th(H, Wa, rows)
        tb = min(max(1, rows // max(th * Wa, 1)), B)
        m = tb * th * Wa
        vmem = (
            2 * tb * (th + 2 * ph) * Wp * Cp * isz      # x double buffer
            + tb * (th + 2 * ph) * Wa * kw * Cp * isz   # patch buffer
            + (m * kh * kw * Cp * isz if fold_kh else 0)  # concat A
            + 2 * kh * kw * Cp * TN * isz               # w (pipelined)
            + m * TN * 4                                # f32 acc
            + 2 * tb * th * W * TN * jnp.dtype(out_dtype).itemsize
        )
        return th, tb, vmem

    rows = block_rows
    TH, TB, vmem = plan(rows)
    while vmem > 12 * 1024 * 1024 and rows > 128:
        rows //= 2
        TH, TB, vmem = plan(rows)
    Hp = _round_up(H, TH)
    THp = TH + 2 * ph
    Bp = _round_up(B, TB)

    # Host-side (XLA) zero-pad; real pixels sit at [b, ph:H+ph, pw:W+pw, :C].
    x_p = jnp.pad(
        x,
        (
            (0, Bp - B),
            (ph, Hp - H + ph),
            (pw, Wp - W - pw),
            (0, Cp - C),
        ),
    )
    # Weights reorganized to [kh*kw*Cp, Np]: K index (dh·kw + dw)·Cp + c
    # matches the patch-buffer packing (dw in lanes) and kh concat order.
    w_p = jnp.pad(
        w.astype(x.dtype), ((0, 0), (0, 0), (0, Cp - C), (0, Np - N))
    ).reshape(kh * kw * Cp, Np)
    bias = jnp.zeros((N,), jnp.float32) if bias is None else bias.astype(jnp.float32)
    scale = jnp.ones((N,), jnp.float32) if scale is None else scale.astype(jnp.float32)
    bias_p = jnp.pad(bias, (0, Np - N))[None, :]
    scale_p = jnp.pad(scale, (0, Np - N))[None, :]

    nB, nH, nN = Bp // TB, Hp // TH, Np // TN
    grid = (nN, nB, nH)  # N tile outermost: weight block fetched nN×, not per step
    kernel = functools.partial(
        _conv_kernel,
        TB=TB, TH=TH, THp=THp, Wa=Wa, W_out=W, kh=kh, kw=kw, Cp=Cp,
        relu=relu, n_bi=nB * nH, nN=nN, nH=nH, fold_kh=fold_kh,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM; manual DMA
            pl.BlockSpec(
                (kh * kw * Cp, TN), lambda j, b, i: (0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, TN), lambda j, b, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda j, b, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TB, TH, W, TN), lambda j, b, i: (b, i, 0, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, Hp, W, Np), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, TB, THp, Wp, Cp), x.dtype),
            pltpu.VMEM((TB, THp, Wa, kw * Cp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Hp * Wa * kh * kw * Cp * Np,
            bytes_accessed=(Bp * Hp * Wp * Cp + kh * kw * Cp * Np)
            * x.dtype.itemsize
            + Bp * Hp * W * Np * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(x_p, w_p, scale_p, bias_p)
    return out[:B, :H, :, :N]
