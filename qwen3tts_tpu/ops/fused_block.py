"""Fused weight-streaming kernels for the latency-bound decode step.

Measured problem (benchmarks/decompose.py + matvec_probe.py on TPU v5e): a
single large XLA matmul streams ~530 GB/s, but the talker decode step — 112
individual 2-12 MB matvecs with norms/rope/attention interleaved — achieves
only ~220 GB/s, because each small op re-pays DMA pipeline startup and XLA
does not prefetch the next op's weights across fusion boundaries.  The fix is
to stream a whole layer-half's weights through ONE Pallas grid pipeline
(automatic double-buffering of the weight tiles), with the cheap vector math
(RMSNorm, SiLU, residuals) recomputed inline on the VPU while tiles arrive.

Two kernels cover a decoder block (models/layers.py:block_forward):

  fused_norm_matmul   y = rms_norm(x, w_norm) @ W          (the qkv half)
  fused_o_mlp         x2 = x + attn @ Wo
                      y  = x2 + (silu(g)*u) @ Wd,  [g u] = rms_norm(x2) @ Wgu
                                                           (the o+MLP half)

Both take [B, H] activations with small B (decode: 1-8 rows) and stream the
weight matrices in lane-dimension tiles.  The attention core between them
stays in ops/flash_decode.py.  The reference has no analog — its CUDA-graph
capture (talker_graph.py:109-147) removes launch overhead but cannot change
cuBLAS's per-matmul memory behavior; this kernel level is where the TPU build
goes past graph capture.

Int8 weight-only mode: when a weight arrives as ``{"q": int8, "scale": f32}``
(ops/quant.py layout) the kernels DMA the int8 tiles — HALF the bytes — and
dequantize each tile on the VPU while the next tile's DMA is in flight.  The
XLA weight-only path instead materializes the convert as part of the fused
dot read, which caps its effective bandwidth near the bf16 rate; tile-level
dequant inside the Pallas pipeline is the way int8 actually buys 2x on a
bandwidth-bound decode step.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rms_norm_f32(x_f32: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    var = jnp.mean(x_f32 * x_f32, axis=-1, keepdims=True)
    return x_f32 * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)


def _use_interpret(interpret: bool) -> bool:
    return interpret or jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# fused_norm_matmul: y = rms_norm(x) @ W, W streamed in [H, tile] blocks
# ---------------------------------------------------------------------------


def _tile(w_ref, s_ref, dtype):
    """Materialize a weight tile in compute dtype: plain read, or int8 tile ×
    per-out-channel scale (the convert runs on the VPU inside the pipeline,
    overlapped with the next tile's DMA)."""
    w = w_ref[...]
    if s_ref is None:
        return w
    return (w.astype(jnp.float32) * s_ref[...]).astype(dtype)


def _norm_mm_kernel(x_ref, nw_ref, w_ref, *rest, eps: float, quant: bool):
    if quant:
        s_ref, o_ref = rest
    else:
        (o_ref,) = rest
        s_ref = None
    # The norm is a [B, H] VPU op — recomputing it per grid step is ~free
    # compared to the 1-2 MB weight-tile DMA it overlaps with.
    h = _rms_norm_f32(x_ref[...].astype(jnp.float32), nw_ref[0], eps)
    w = _tile(w_ref, s_ref, x_ref.dtype)
    o_ref[...] = jax.lax.dot_general(
        h.astype(x_ref.dtype), w,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _split_quant(w):
    """(payload, scale_2d_or_None) for a plain array or int8 quant dict."""
    if isinstance(w, dict):
        q = w["q"]
        return q, w["scale"].reshape(1, q.shape[-1]).astype(jnp.float32)
    return w, None


@functools.partial(jax.jit, static_argnames=("eps", "tile", "interpret"))
def fused_norm_matmul(
    x: jnp.ndarray,  # [B, H]
    norm_w: jnp.ndarray,  # [H]
    w,  # [H, N] array, or {"q": int8 [H, N], "scale": f32 [1, N]}
    *,
    eps: float = 1e-6,
    tile: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """rms_norm(x, norm_w) @ w with w streamed through the Pallas pipeline.
    Returns [B, N] in x.dtype."""
    B, H = x.shape
    wq, ws = _split_quant(w)
    N = wq.shape[1]
    tile = min(tile, N)
    assert N % tile == 0, (N, tile)
    quant = ws is not None
    in_specs = [
        pl.BlockSpec((B, H), lambda i: (0, 0)),
        pl.BlockSpec((1, H), lambda i: (0, 0)),
        pl.BlockSpec((H, tile), lambda i: (0, i)),
    ]
    args = [x, norm_w.reshape(1, H), wq]
    if quant:
        in_specs.append(pl.BlockSpec((1, tile), lambda i: (0, i)))
        args.append(ws)
    return pl.pallas_call(
        functools.partial(_norm_mm_kernel, eps=eps, quant=quant),
        grid=(N // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, tile), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
        interpret=_use_interpret(interpret),
    )(*args)


# ---------------------------------------------------------------------------
# fused_o_mlp: o-projection + residual + post-norm + SwiGLU MLP + residual
# ---------------------------------------------------------------------------


def _o_mlp_kernel(
    x_ref,  # VMEM [B, H] — residual input
    attn_ref,  # VMEM [B, Dq] — attention output (flat heads)
    ow_ref,  # VMEM [Dq, H] — constant block: fetched once, stays resident
    nw_ref,  # VMEM [H] — post_attention_layernorm weight
    gw_ref,  # VMEM [H, tile] — gate tile i-1 (gateup[:, :I])
    uw_ref,  # VMEM [H, tile] — up tile i-1 (gateup[:, I:])
    dw_ref,  # VMEM [tile, H] — down tile i-1
    *rest,  # [quant scales: ow_s, gw_s, uw_s, dw_s], o_ref, x2_scr, acc_scr
    eps: float,
    n_tiles: int,
    quant: bool,
):
    if quant:
        ow_s, gw_s, uw_s, dw_s, o_ref, x2_scr, acc_scr = rest
    else:
        o_ref, x2_scr, acc_scr = rest
        ow_s = gw_s = uw_s = dw_s = None
    i = pl.program_id(0)
    dt = x_ref.dtype

    @pl.when(i == 0)
    def _():
        x2 = x_ref[...].astype(jnp.float32) + jax.lax.dot_general(
            attn_ref[...], _tile(ow_ref, ow_s, dt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        x2_scr[...] = x2
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(i > 0)
    def _():
        h = _rms_norm_f32(x2_scr[...], nw_ref[0], eps).astype(dt)
        g = jax.lax.dot_general(
            h, _tile(gw_ref, gw_s, dt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        u = jax.lax.dot_general(
            h, _tile(uw_ref, uw_s, dt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        act = (g * jax.nn.sigmoid(g) * u).astype(dt)
        acc_scr[...] += jax.lax.dot_general(
            act, _tile(dw_ref, dw_s, dt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(i == n_tiles)  # last step
    def _():
        o_ref[...] = (x2_scr[...] + acc_scr[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "tile", "interpret"))
def fused_o_mlp(
    x: jnp.ndarray,  # [B, H] residual input
    attn: jnp.ndarray,  # [B, Dq] attention output
    o_w,  # [Dq, H] array or int8 quant dict
    norm_w: jnp.ndarray,  # [H]
    gateup_w,  # [H, 2I] fused gate|up layout (models/layers.py:72), or quant
    down_w,  # [I, H] array or quant
    *,
    eps: float = 1e-6,
    tile: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + attn@o_w, then + SwiGLU MLP of its post-norm.  Returns [B, H]."""
    B, H = x.shape
    Dq = attn.shape[1]
    ow_q, ow_s = _split_quant(o_w)
    gu_q, gu_s = _split_quant(gateup_w)
    dw_q, dw_s = _split_quant(down_w)
    quant = ow_s is not None
    assert (gu_s is not None) == quant and (dw_s is not None) == quant, \
        "o/gateup/down must be uniformly quantized (quantize_block_stack)"
    I = dw_q.shape[0]
    tile = min(tile, I)
    assert I % tile == 0, (I, tile)
    n_tiles = I // tile
    nt = n_tiles  # grid length is n_tiles + 1 (step 0 = o-proj + norm prep)

    def gate_map(i):
        return (0, jnp.maximum(i - 1, 0))

    def up_map(i):
        return (0, nt + jnp.maximum(i - 1, 0))

    def down_map(i):
        return (jnp.maximum(i - 1, 0), 0)

    in_specs = [
        pl.BlockSpec((B, H), lambda i: (0, 0)),
        pl.BlockSpec((B, Dq), lambda i: (0, 0)),
        pl.BlockSpec((Dq, H), lambda i: (0, 0)),  # resident
        pl.BlockSpec((1, H), lambda i: (0, 0)),
        pl.BlockSpec((H, tile), gate_map),  # gateup[:, :I] tiles
        pl.BlockSpec((H, tile), up_map),  # gateup[:, I:] tiles
        pl.BlockSpec((tile, H), down_map),
    ]
    args = [x, attn, ow_q, norm_w.reshape(1, H), gu_q, gu_q, dw_q]
    if quant:
        in_specs += [
            pl.BlockSpec((1, H), lambda i: (0, 0)),  # o scale (resident)
            pl.BlockSpec((1, tile), gate_map),  # gate scales
            pl.BlockSpec((1, tile), up_map),  # up scales
            pl.BlockSpec((1, H), lambda i: (0, 0)),  # down scale (resident)
        ]
        args += [ow_s, gu_s, gu_s, dw_s]
    return pl.pallas_call(
        functools.partial(_o_mlp_kernel, eps=eps, n_tiles=n_tiles,
                          quant=quant),
        grid=(n_tiles + 1,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, H), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=_use_interpret(interpret),
    )(*args)
