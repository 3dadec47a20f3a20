"""Fused predictor micro-step: proj + all 5 decoder layers in ONE kernel.

The code predictor's frame is 15 sequential micro-steps, each running the
5-layer MTP stack on a single token (models/predictor.py:predict_frame).
As XLA ops that is ~40 fusions per micro-step (~600 per frame); measured on
v5e the frame runs at ~405 GB/s of a ~530 GB/s streaming ceiling — about
1 ms/frame lost to op boundaries (benchmarks/predictor_probe.py).

This kernel executes one whole micro-step as a single Pallas program:

  - a PHASE GRID walks the weight matrices in lane-dimension tiles
    (proj → per layer: qkv → attention → o → gate|up → down), so the weight
    stream is one continuous double-buffered DMA pipeline;
  - the 17-slot KV cache (174 KB for all 5 layers) lives in VMEM for the
    whole program, read and written in place (input/output aliased) — the
    TPU realization of the round-1 TODO "KV stays in VMEM";
  - per-phase block choices come from static int32 tables read through
    scalar prefetch (pallas_guide.md PrefetchScalarGridSpec pattern), with
    each array's table pinned to its NEXT block outside its own phases so
    the pipeline prefetches layer l+1's first tile during layer l;
  - the cheap vector math (RMSNorm, q/k head norm, RoPE, online attention
    over ≤17 slots, SiLU) runs on the VPU between tile DMAs.

Batch-1 (the latency path).  Sampling and the per-codebook lm_head/embedding
stay in XLA between micro-steps.  Reference equivalence: the whole 15-step
loop inside one CUDA graph (predictor_graph.py:115-167) — this goes further
by also collapsing the op stream inside each micro-step.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# phase kinds
K_PROJ, K_QKV, K_ATTN, K_O, K_GU, K_DN = range(6)

# tabs rows: kind, tile-in-phase, and per-array (layer, tile) block coords
(R_KIND, R_QKV_L, R_QKV_T, R_O_L, R_O_T, R_G_L, R_G_T, R_U_T, R_D_L, R_D_T,
 R_PROJ_T, R_LAYER) = range(12)


def _build_schedule(L: int, qkv_t: int, o_t: int, gu_t: int, dn_t: int,
                    proj_t: int) -> np.ndarray:
    """[12, G] int32 phase tables.  Each array's (layer, tile) rows change
    only when that array is active, and jump to the next needed block right
    after — an early prefetch hint for the Pallas pipeline."""
    steps = []  # (kind, layer, tile)
    for j in range(proj_t):
        steps.append((K_PROJ, 0, j))
    for l in range(L):
        for j in range(qkv_t):
            steps.append((K_QKV, l, j))
        steps.append((K_ATTN, l, 0))
        for j in range(o_t):
            steps.append((K_O, l, j))
        for j in range(gu_t):
            steps.append((K_GU, l, j))
        for j in range(dn_t):
            steps.append((K_DN, l, j))
    G = len(steps)
    tabs = np.zeros((12, G), np.int32)

    def fill(row_l, row_t, kind, n_tiles, with_layer=True):
        """Active steps use their own (l, t); other steps pin to the next
        active block (or hold the last one at the very end)."""
        active = [(g, l, t) for g, (k, l, t) in enumerate(steps) if k == kind]
        ai = 0
        for g in range(G):
            while ai < len(active) and active[ai][0] < g:
                ai += 1
            if ai < len(active):
                _, l, t = active[ai]
            else:
                _, l, t = active[-1]
            if row_l is not None:
                tabs[row_l, g] = l if with_layer else 0
            tabs[row_t, g] = t
        return

    for g, (k, l, t) in enumerate(steps):
        tabs[R_KIND, g] = k
        tabs[R_LAYER, g] = l
    fill(R_QKV_L, R_QKV_T, K_QKV, qkv_t)
    fill(R_O_L, R_O_T, K_O, o_t)
    fill(R_G_L, R_G_T, K_GU, gu_t)
    fill(None, R_U_T, K_GU, gu_t)
    fill(R_D_L, R_D_T, K_DN, dn_t)
    fill(None, R_PROJ_T, K_PROJ, proj_t)
    return tabs


def _kernel(
    tabs_ref,  # SMEM [12, G]
    pos_ref,  # SMEM [1] — absolute cache position of this token
    # --- inputs (VMEM blocks) ---
    x_ref,  # [1, Ht] token embedding (talker space)
    projw_ref,  # [Ht, TP] proj tile
    projb_ref,  # [nH, TP] (const; pre-tiled to match xp_scr)
    innorm_ref,  # [1, Hp] layer slice of input_norm
    postnorm_ref,  # [1, Hp]
    qnorm_ref,  # [1, D]
    knorm_ref,  # [1, D]
    fnorm_ref,  # [1, Hp] (const)
    cos_ref,  # [1, D] (const)
    sin_ref,  # [1, D]
    qkvw_ref,  # [Hp, TQ] tile
    ow_ref,  # [Dq, TO] tile
    gw_ref,  # [Hp, TG] gate tile
    uw_ref,  # [Hp, TG] up tile
    dw_ref,  # [TD, Hp] down tile
    kc_in,  # [L, S, KVH, D] VMEM — K cache input (aliased to kc_ref; the
    vc_in,  # kernel reads/writes ONLY the output refs: the alias seeds them)
    # --- outputs ---
    h_ref,  # [1, Hp] final hidden
    kc_ref,  # [L, S, KVH, D] — the live cache (aliased with kc_in)
    vc_ref,
    # --- scratch (Hp/I axes tiled on the LEADING dim: Mosaic does not
    #     support dynamic lane-dimension slicing, leading-dim indexing is
    #     free) ---
    xp_scr,  # [nH, TH] f32 residual stream
    hn_scr,  # [1, Hp] bf16 normed activations
    qkv_scr,  # [qkv_t, TQ] f32
    attn_scr,  # [1, Dq] bf16
    act_scr,  # [gu_t, TG] bf16
    dacc_scr,  # [1, Hp] f32
    *,
    spec,  # dict of static dims
    eps: float,
    scale: float,
    n_steps: int,
):
    g = pl.program_id(0)
    kind = tabs_ref[R_KIND, g]
    layer = tabs_ref[R_LAYER, g]
    pos = pos_ref[0]
    TP, TQ, TO, TG, TD = (spec["TP"], spec["TQ"], spec["TO"], spec["TG"],
                          spec["TD"])
    Hp, Dq, Dkv, D, KVH, NH = (spec["Hp"], spec["Dq"], spec["Dkv"], spec["D"],
                               spec["KVH"], spec["NH"])
    G_heads = NH // KVH
    S = kc_ref.shape[1]
    dt = x_ref.dtype

    Hp_ = Hp

    def xp_flat():
        return xp_scr[...].reshape(1, Hp_)

    def rms(v, w_ref):
        vf = v.astype(jnp.float32)
        var = jnp.mean(vf * vf, axis=-1, keepdims=True)
        return (vf * jax.lax.rsqrt(var + eps)
                ) * w_ref[...].astype(jnp.float32)

    @pl.when(kind == K_PROJ)
    def _():
        t = tabs_ref[R_PROJ_T, g]
        y = jax.lax.dot_general(
            x_ref[...], projw_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        xp_scr[t] = y[0] + projb_ref[t].astype(jnp.float32)

    @pl.when(kind == K_QKV)
    def _():
        t = tabs_ref[R_QKV_T, g]

        @pl.when(t == 0)
        def _():
            hn_scr[...] = rms(xp_flat(), innorm_ref).astype(dt)

        y = jax.lax.dot_general(
            hn_scr[...], qkvw_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        qkv_scr[t] = y[0]

    @pl.when(kind == K_ATTN)
    def _():
        qkv = qkv_scr[...].reshape(Dq + 2 * Dkv)  # f32
        q = qkv[:Dq].reshape(NH, D)
        k = qkv[Dq:Dq + Dkv].reshape(KVH, D)
        v = qkv[Dq + Dkv:].reshape(KVH, D)
        # per-head RMS norm (models/layers.py:145-146)
        qn = qnorm_ref[...].astype(jnp.float32)

        def hn(h, w):
            var = jnp.mean(h * h, axis=-1, keepdims=True)
            return h * jax.lax.rsqrt(var + eps) * w

        q = hn(q, qn)
        k = hn(k, knorm_ref[...].astype(jnp.float32))
        # rope (ops/rope.py apply_rope: rotate-half formulation)
        cos = cos_ref[...].astype(jnp.float32)  # [1, D]
        sin = sin_ref[...].astype(jnp.float32)
        half = D // 2

        def rope(h):
            h1, h2 = h[:, :half], h[:, half:]
            rot = jnp.concatenate([-h2, h1], axis=-1)
            return h * cos + rot * sin

        q = rope(q)
        k = rope(k)
        # write K/V rows at pos (bf16 cache)
        kc_ref[layer, pos] = k.astype(kc_ref.dtype)
        vc_ref[layer, pos] = v.astype(vc_ref.dtype)
        # attention over slots [0, pos]
        kcache = kc_ref[layer].astype(jnp.float32)  # [S, KVH, D]
        vcache = vc_ref[layer].astype(jnp.float32)
        qg = q.reshape(KVH, G_heads, D)
        kk = jnp.swapaxes(kcache, 0, 1)  # [KVH, S, D]
        vv = jnp.swapaxes(vcache, 0, 1)
        scores = jax.lax.dot_general(
            qg, kk, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # [KVH, G, S]
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S), 2)
        scores = jnp.where(idx <= pos, scores, -1e30)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p, vv, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [KVH, G, D]
        attn_scr[...] = out.reshape(1, Dq).astype(dt)

    @pl.when(kind == K_O)
    def _():
        t = tabs_ref[R_O_T, g]
        y = jax.lax.dot_general(
            attn_scr[...], ow_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        xp_scr[t] = xp_scr[t] + y[0]

    @pl.when(kind == K_GU)
    def _():
        t = tabs_ref[R_G_T, g]

        @pl.when(t == 0)
        def _():
            hn_scr[...] = rms(xp_flat(), postnorm_ref).astype(dt)
            dacc_scr[...] = jnp.zeros_like(dacc_scr)

        gt = jax.lax.dot_general(
            hn_scr[...], gw_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ut = jax.lax.dot_general(
            hn_scr[...], uw_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        a = gt * jax.nn.sigmoid(gt) * ut
        act_scr[t] = a[0].astype(dt)

    @pl.when(kind == K_DN)
    def _():
        t = tabs_ref[R_D_T, g]
        a = act_scr[t][None]
        y = jax.lax.dot_general(
            a, dw_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dacc_scr[...] = dacc_scr[...] + y

        @pl.when(t == spec["dn_t"] - 1)
        def _():
            nH, TH = xp_scr.shape
            xp_scr[...] = xp_scr[...] + dacc_scr[...].reshape(nH, TH)

    @pl.when(g == n_steps - 1)
    def _():
        h_ref[...] = rms(xp_flat(), fnorm_ref).astype(h_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "interpret"),
)
def fused_micro_step(
    blocks: Dict[str, jnp.ndarray],  # layer-stacked predictor blocks
    proj_w: jnp.ndarray,  # [Ht, Hp]
    proj_b: jnp.ndarray,  # [Hp]
    final_norm: jnp.ndarray,  # [Hp]
    x_emb: jnp.ndarray,  # [1, Ht] token embedding
    cos: jnp.ndarray,  # [D] rope cos for this position
    sin: jnp.ndarray,
    kv_k: jnp.ndarray,  # [L, S, KVH, D] (batch-1, squeezed)
    kv_v: jnp.ndarray,
    pos: jnp.ndarray,  # scalar int32
    *,
    eps: float = 1e-6,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One predictor micro-step.  Returns (h [1, Hp], kv_k', kv_v')."""
    L, S, KVH, D = kv_k.shape
    Ht, Hp = proj_w.shape
    qkv_w = blocks["qkv_proj"]  # [L, Hp, Dq+2Dkv]
    Dq = blocks["o_proj"].shape[1]
    Dkv = (qkv_w.shape[2] - Dq) // 2
    NH = Dq // D
    I = blocks["down_proj"].shape[1]
    gu_w = blocks["gateup_proj"]  # [L, Hp, 2I]

    TH = min(512, Hp)  # shared Hp-axis tile: proj/o slices == xp_scr rows
    TP = TO = TH
    TQ = min(512, Dq + 2 * Dkv)
    TG = TD = min(512, I)  # act_scr rows are consumed 1:1 by down tiles
    proj_t = Hp // TP
    qkv_t = (Dq + 2 * Dkv) // TQ
    o_t = Hp // TO
    gu_t = I // TG
    dn_t = I // TD
    assert Hp % TH == 0 and (Dq + 2 * Dkv) % TQ == 0 and I % TG == 0

    tabs = _build_schedule(L, qkv_t, o_t, gu_t, dn_t, proj_t)
    G = tabs.shape[1]
    spec = dict(TP=TP, TQ=TQ, TO=TO, TG=TG, TD=TD, Hp=Hp, Dq=Dq, Dkv=Dkv,
                D=D, KVH=KVH, NH=NH, dn_t=dn_t)

    if not interpret and jax.default_backend() == "cpu":
        interpret = True

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, Ht), lambda g, t, p: (0, 0)),  # x_emb
            pl.BlockSpec((Ht, TP), lambda g, t, p: (0, t[R_PROJ_T, g])),
            pl.BlockSpec((proj_t, TP), lambda g, t, p: (0, 0)),  # proj_b
            pl.BlockSpec((1, Hp), lambda g, t, p: (t[R_LAYER, g], 0)),  # in_norm
            pl.BlockSpec((1, Hp), lambda g, t, p: (t[R_LAYER, g], 0)),  # post
            pl.BlockSpec((1, D), lambda g, t, p: (t[R_LAYER, g], 0)),  # q_norm
            pl.BlockSpec((1, D), lambda g, t, p: (t[R_LAYER, g], 0)),  # k_norm
            pl.BlockSpec((1, Hp), lambda g, t, p: (0, 0)),  # final_norm
            pl.BlockSpec((1, D), lambda g, t, p: (0, 0)),  # cos
            pl.BlockSpec((1, D), lambda g, t, p: (0, 0)),  # sin
            pl.BlockSpec((1, Hp, TQ),
                         lambda g, t, p: (t[R_QKV_L, g], 0, t[R_QKV_T, g])),
            pl.BlockSpec((1, Dq, TO),
                         lambda g, t, p: (t[R_O_L, g], 0, t[R_O_T, g])),
            pl.BlockSpec((1, Hp, TG),
                         lambda g, t, p: (t[R_G_L, g], 0, t[R_G_T, g])),
            pl.BlockSpec((1, Hp, TG),
                         lambda g, t, p: (t[R_G_L, g], 0,
                                          I // TG + t[R_U_T, g])),
            pl.BlockSpec((1, TD, Hp),
                         lambda g, t, p: (t[R_D_L, g], t[R_D_T, g], 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # kv_k (whole, resident)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # kv_v
        ],
        out_specs=[
            pl.BlockSpec((1, Hp), lambda g, t, p: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((proj_t, TH), jnp.float32),  # xp (tiled rows)
            pltpu.VMEM((1, Hp), x_emb.dtype),  # hn
            pltpu.VMEM((qkv_t, TQ), jnp.float32),
            pltpu.VMEM((1, Dq), x_emb.dtype),  # attn
            pltpu.VMEM((gu_t, TG), x_emb.dtype),  # act
            pltpu.VMEM((1, Hp), jnp.float32),  # down acc
        ],
    )
    h, kk, vv = pl.pallas_call(
        functools.partial(_kernel, spec=spec, eps=eps, scale=D**-0.5,
                          n_steps=G),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((1, Hp), x_emb.dtype),
            jax.ShapeDtypeStruct(kv_k.shape, kv_k.dtype),
            jax.ShapeDtypeStruct(kv_v.shape, kv_v.dtype),
        ),
        input_output_aliases={17: 1, 18: 2},  # kv_k/kv_v in-place
        interpret=interpret,
    )(
        jnp.asarray(tabs),
        jnp.reshape(pos.astype(jnp.int32), (1,)),
        x_emb,
        proj_w,
        proj_b.reshape(proj_t, TP),
        blocks["input_norm"],
        blocks["post_norm"],
        blocks["q_norm"],
        blocks["k_norm"],
        final_norm.reshape(1, Hp),
        cos.reshape(1, D),
        sin.reshape(1, D),
        qkv_w,
        blocks["o_proj"],
        gu_w,
        gu_w,
        blocks["down_proj"],
        kv_k,
        kv_v,
    )
    return h, kk, vv
