"""Pallas flash-decode attention over the padded static KV cache.

The reference leans on cuDNN SDPA over the full fixed-length mask
(SURVEY.md §2.3 item 3); the XLA fallback here similarly scores all
``max_seq_len`` slots and masks.  This kernel is the TPU-native upgrade:

  - K/V stay in HBM; the kernel DMA-streams only the *live* prefix
    (``ceil((pos+1)/block)`` blocks — a dynamic trip count, so at position
    100 of a 2048-slot cache it moves ~5% of the bytes);
  - double-buffered async copies overlap the next block's DMA with the
    current block's MXU work (pallas_guide.md double-buffering pattern);
  - online softmax (running max / sum) in f32 scratch, GQA via a
    kv-head-batched dot.

Single-token decode.  Batched form: q [B, NH, D], cache [B, S, KVH, D] with
a grid step per row and PER-ROW pad bounds — rows admitted mid-batch by the
continuous-batching scheduler carry large left-pads, and the kernel starts
its DMA loop at the first live block (``pad // block``), so a joined row
costs only its own live prefix.  The reference has no batched decode at all
(strictly batch-1, SURVEY §2.4); its single-GPU analog would score the whole
fixed window.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(
    lay_ref,  # SMEM [1] int32 — layer index into the stacked cache
    pos_ref,  # SMEM [1] int32 — current absolute position (shared)
    pad_ref,  # SMEM [B] int32 — PER-ROW left-pad counts
    q_ref,  # VMEM [1, KVH, G, D] — this grid step's row
    k_hbm,  # ANY [L, B, S, KVH, D] — full stacked cache; only layer l is read
    v_hbm,  # ANY [L, B, S, KVH, D]
    *rest,  # [ks_hbm, vs_hbm (ANY [L,B,KVH,S] f32) when quant], o_ref, scratch
    block_size: int,
    sliding_window: Optional[int],
    scale: float,
    quant: bool,
):
    if quant:
        (ks_hbm, vs_hbm, o_ref, kbuf, vbuf, ksbuf, vsbuf,
         m_scr, l_scr, acc_scr, sems) = rest
    else:
        o_ref, kbuf, vbuf, m_scr, l_scr, acc_scr, sems = rest
        ks_hbm = vs_hbm = ksbuf = vsbuf = None
    b = pl.program_id(0)
    lay = lay_ref[0]
    pos = pos_ref[0]
    pad = pad_ref[b]
    BS = block_size
    _, KVH, G, D = q_ref.shape
    nb = (pos + 1 + BS - 1) // BS  # dynamic trip count — the whole point
    i0 = pad // BS  # first block with any live slot for THIS row
    if sliding_window is not None:
        i0 = jnp.maximum(i0, jnp.maximum(pos - sliding_window + 1, 0) // BS)

    def k_dma(i, slot):
        return pltpu.make_async_copy(
            k_hbm.at[lay, b, pl.ds(i * BS, BS)], kbuf.at[slot], sems.at[slot, 0]
        )

    def v_dma(i, slot):
        return pltpu.make_async_copy(
            v_hbm.at[lay, b, pl.ds(i * BS, BS)], vbuf.at[slot], sems.at[slot, 1]
        )

    def s_dmas(i, slot):
        # scales are [L, B, KVH, S]: slice [KVH, BS] on the lane axis
        return (
            pltpu.make_async_copy(
                ks_hbm.at[lay, b, slice(None), pl.ds(i * BS, BS)],
                ksbuf.at[slot], sems.at[slot, 2]),
            pltpu.make_async_copy(
                vs_hbm.at[lay, b, slice(None), pl.ds(i * BS, BS)],
                vsbuf.at[slot], sems.at[slot, 3]),
        )

    def start_all(i, slot):
        k_dma(i, slot).start()
        v_dma(i, slot).start()
        if quant:
            for c in s_dmas(i, slot):
                c.start()

    def wait_all(i, slot):
        k_dma(i, slot).wait()
        v_dma(i, slot).wait()
        if quant:
            for c in s_dmas(i, slot):
                c.wait()

    # warm up the pipeline — ONLY when the row has at least one live block.
    # A row with pad > pos (e.g. a mis-joined batch row) gives i0 >= nb: the
    # fori_loop below is empty, so an unconditional start here would leave
    # an un-waited DMA/semaphore behind — a hard device abort at kernel end,
    # not a numeric error.  Guarded, such a row falls through to the l==0
    # divide guard and returns zeros.
    @pl.when(i0 < nb)
    def _():
        start_all(i0, jax.lax.rem(i0, 2))

    m_scr[...] = jnp.full_like(m_scr, NEG_INF)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32)  # [KVH, G, D]

    def load_kv(buf, sbuf, slot):
        """[BS, KVH, D] tile → [KVH, BS, D] f32, dequantized when int8
        (scale tiles arrive as [KVH, BS])."""
        t = jnp.swapaxes(buf[slot], 0, 1).astype(jnp.float32)
        if quant:
            t = t * sbuf[slot][..., None]
        return t

    def body(i, _):
        slot = jax.lax.rem(i, 2)
        nslot = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < nb)
        def _():
            start_all(i + 1, nslot)

        wait_all(i, slot)

        k = load_kv(kbuf, ksbuf, slot)  # [KVH, BS, D]
        scores = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [KVH, G, BS]

        idx = i * BS + jax.lax.broadcasted_iota(jnp.int32, (1, 1, BS), 2)
        valid = (idx <= pos) & (idx >= pad)
        if sliding_window is not None:
            valid = valid & (idx > pos - sliding_window)
        scores = jnp.where(valid, scores, NEG_INF)

        m_prev = m_scr[:, :, 0:1]  # [KVH, G, 1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)  # [KVH, G, 1]
        p = jnp.exp(scores - m_new)  # [KVH, G, BS]
        # NEG_INF is a finite sentinel: in a fully-masked block m_new ==
        # NEG_INF and exp(0) == 1 would count every masked slot in the
        # denominator.  Zero them so an all-masked row truly accumulates
        # l == 0 and hits the divide guard below.
        p = jnp.where(scores > NEG_INF * 0.5, p, 0.0)

        l_prev = l_scr[:, :, 0:1]
        l_scr[...] = jnp.broadcast_to(l_prev * corr + jnp.sum(p, -1, keepdims=True),
                                      l_scr.shape)
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)

        v = load_kv(vbuf, vsbuf, slot)  # [KVH, BS, D]
        pv = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [KVH, G, D]
        acc_scr[...] = acc_scr[...] * corr + pv
        return 0

    jax.lax.fori_loop(i0, nb, body, 0)
    # a fully-padded row (zero live slots) accumulates l == 0 (masked p is
    # zeroed above); max(denom, tiny) turns its 0/0 into 0 instead of NaN
    o_ref[0] = (acc_scr[...] / jnp.maximum(l_scr[:, :, 0:1], 1e-30)
                ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_size", "sliding_window", "interpret")
)
def flash_decode_stacked(
    q: jnp.ndarray,  # [B, NH, D] (post rope+norm)
    k_stack: jnp.ndarray,  # [L, B, S, KVH, D] — the full layer-stacked cache
    v_stack: jnp.ndarray,  # [L, B, S, KVH, D]
    layer: jnp.ndarray,  # scalar int32 — which layer's cache to read
    pos: jnp.ndarray,  # scalar int32 (shared cache position)
    pad_count: jnp.ndarray,  # [B] int32 per-row left pads
    *,
    block_size: int = 256,
    sliding_window: Optional[int] = None,
    interpret: bool = False,
    k_scale: Optional[jnp.ndarray] = None,  # [L, B, KVH, S] f32 (int8 cache)
    v_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Returns attention output [B, NH, D] (same dtype as q); one grid step
    per row, each reading only its own live KV prefix from HBM.

    Takes the WHOLE stacked cache + a (traced) layer index so the per-layer
    decode scan never materializes a per-layer cache slice — the kernel DMAs
    straight out of ``k_stack[layer]`` in HBM.  (Slicing the stack in XLA
    first would copy ~8 MB per layer per step, which measurably dominates the
    talker decode step — see benchmarks/decompose.py --max-seq-len.)

    With ``k_scale``/``v_scale`` the cache is int8 (init_kv_cache
    kv_quant=True): the kernel moves HALF the KV bytes and dequantizes each
    tile in VMEM after its DMA lands."""
    L, B, S, KVH, D = k_stack.shape
    NH = q.shape[1]
    G = NH // KVH
    quant = k_scale is not None
    block_size = min(block_size, S)
    assert S % block_size == 0, (S, block_size)
    if not interpret and jax.default_backend() == "cpu":
        interpret = True  # compiled Pallas is TPU-only; CPU uses the interpreter
    if not interpret and D % 128 != 0:
        raise ValueError(
            f"flash_decode requires head_dim % 128 == 0 on TPU (got {D}); "
            "use the XLA attention path for this config")
    qg = q.reshape(B, KVH, G, D)

    in_specs = [
        pl.BlockSpec((1, KVH, G, D), lambda b, *_: (b, 0, 0, 0)),  # q row
        pl.BlockSpec(memory_space=pl.ANY),  # k (HBM)
        pl.BlockSpec(memory_space=pl.ANY),  # v (HBM)
    ]
    scratch = [
        pltpu.VMEM((2, block_size, KVH, D), k_stack.dtype),
        pltpu.VMEM((2, block_size, KVH, D), v_stack.dtype),
    ]
    if quant:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 2  # ks, vs (HBM)
        scratch += [pltpu.VMEM((2, KVH, block_size), jnp.float32)] * 2
    scratch += [
        pltpu.VMEM((KVH, G, 128), jnp.float32),
        pltpu.VMEM((KVH, G, 128), jnp.float32),
        pltpu.VMEM((KVH, G, D), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 4 if quant else 2)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, KVH, G, D), lambda b, *_: (b, 0, 0, 0)),
        scratch_shapes=scratch,
    )
    args = [
        jnp.reshape(layer.astype(jnp.int32), (1,)),
        jnp.reshape(pos.astype(jnp.int32), (1,)),
        jnp.broadcast_to(jnp.asarray(pad_count, jnp.int32).reshape(-1), (B,)),
        qg,
        k_stack,
        v_stack,
    ]
    if quant:
        args += [k_scale, v_scale]
    out = pl.pallas_call(
        functools.partial(
            _kernel, block_size=block_size, sliding_window=sliding_window,
            scale=D**-0.5, quant=quant,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, G, D), q.dtype),
        interpret=interpret,
    )(*args)
    return out.reshape(B, NH, D)


def flash_decode_batched(
    q: jnp.ndarray,  # [B, NH, D]
    k_cache: jnp.ndarray,  # [B, S, KVH, D]
    v_cache: jnp.ndarray,  # [B, S, KVH, D]
    pos: jnp.ndarray,
    pad_count: jnp.ndarray,  # [B] int32
    *,
    block_size: int = 256,
    sliding_window: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-layer convenience wrapper over flash_decode_stacked."""
    return flash_decode_stacked(
        q, k_cache[None], v_cache[None], jnp.int32(0), pos, pad_count,
        block_size=block_size, sliding_window=sliding_window,
        interpret=interpret,
    )


def flash_decode(
    q: jnp.ndarray,  # [NH, D]
    k_cache: jnp.ndarray,  # [S, KVH, D]
    v_cache: jnp.ndarray,  # [S, KVH, D]
    pos: jnp.ndarray,
    pad_count: jnp.ndarray,  # scalar int32
    *,
    block_size: int = 256,
    sliding_window: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-row convenience wrapper.  Returns [NH, D]."""
    out = flash_decode_batched(
        q[None], k_cache[None], v_cache[None], pos,
        jnp.reshape(pad_count, (1,)),
        block_size=block_size, sliding_window=sliding_window,
        interpret=interpret,
    )
    return out[0]


def flash_decode_reference(q, k_cache, v_cache, pos, pad_count,
                           sliding_window=None):
    """Pure-jnp oracle for tests: full-length masked attention."""
    S, KVH, D = k_cache.shape
    NH = q.shape[0]
    G = NH // KVH
    qg = q.reshape(KVH, G, D).astype(jnp.float32)
    k = jnp.swapaxes(k_cache, 0, 1).astype(jnp.float32)  # [KVH, S, D]
    v = jnp.swapaxes(v_cache, 0, 1).astype(jnp.float32)
    scores = jnp.einsum("kgd,ksd->kgs", qg, k) * (D**-0.5)
    idx = jnp.arange(S)
    valid = (idx <= pos) & (idx >= pad_count)
    if sliding_window is not None:
        valid = valid & (idx > pos - sliding_window)
    scores = jnp.where(valid[None, None, :], scores, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("kgs,ksd->kgd", p, v)
    return out.reshape(NH, D).astype(q.dtype)
