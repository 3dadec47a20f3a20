"""Fused predictor micro-step: proj + all 5 decoder layers in ONE kernel.

The code predictor's frame is 15 sequential micro-steps, each running the
5-layer MTP stack on a single token (models/predictor.py:predict_frame).
As XLA ops that is ~40 fusions per micro-step (~600 per frame); measured on
v5e the frame runs at ~405 GB/s of a ~530 GB/s streaming ceiling — about
1 ms/frame lost to op boundaries (benchmarks/predictor_probe.py).

This kernel executes one whole micro-step as a single Pallas program:

  - a PHASE GRID walks the weight matrices in tiles (proj → per layer:
    qkv-heads → attention → o → gate|up → down), so the weight stream is one
    continuous double-buffered DMA pipeline;
  - the 17-slot KV cache (174 KB for all 5 layers) lives in VMEM for the
    whole program, read and written in place (input/output aliased) — the
    TPU realization of the round-1 TODO "KV stays in VMEM";
  - per-phase block choices come from static int32 tables read through
    scalar prefetch (pallas_guide.md PrefetchScalarGridSpec pattern), with
    each array's table pinned to its NEXT block outside its own phases so
    the pipeline prefetches layer l+1's first tile during layer l.

Mosaic does not support lane-dimension reshapes (e.g. [4,512]→[1,2048]), so
the kernel NEVER reshapes vectors:

  - the residual stream / normed activations / MLP accumulator are tiled on
    the LEADING axis ([nH, TH] f32 — dynamic row indexing is free for f32);
  - the qkv and o projection weights are relayed out HEAD-MAJOR on the host
    (wrapper) so each head's matvec writes a head-shaped [D] row directly;
  - RoPE's rotate-half is a constant [D, D] anti-identity MATRIX multiply
    (one tiny MXU dot) instead of lane slicing;
  - attention runs per kv-head with static row slices of head-shaped
    scratch.

Batch-1 (the latency path).  Sampling and the per-codebook lm_head/embedding
stay in XLA between micro-steps.  Reference equivalence: the whole 15-step
loop inside one CUDA graph (predictor_graph.py:115-167) — this goes further
by also collapsing the op stream inside each micro-step.

MEASURED RESULT (v5e, benchmarks/predictor_probe.py): 8.94 ms/frame vs the
XLA path's 4.90 ms — the reshape-free formulation forces per-head matvecs
([1,TH]x[TH,64]: 64 of 128 MXU output lanes, 16 serialized dots per qkv
phase) and 97 small grid steps, which costs far more than the op-boundary
overhead it removes.  Kept as an OPT-IN experiment (predict_frame
micro_kernel=True) and as the worked example of the phase-grid +
scalar-prefetch-table pattern; the production predictor path stays XLA
(~405 GB/s of the ~530 GB/s ceiling).
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

# tabs rows: kind + per-array (layer, tile) block coords
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

    def fill(row_l, row_t, kind):
        active = [(g, l, t) for g, (k, l, t) in enumerate(steps) if k == kind]
        ai = 0
        for g in range(G):
            while ai < len(active) and active[ai][0] < g:
                ai += 1
            _, l, t = active[ai] if ai < len(active) else active[-1]
            if row_l is not None:
                tabs[row_l, g] = l
            tabs[row_t, g] = t

    for g, (k, l, t) in enumerate(steps):
        tabs[R_KIND, g] = k
        tabs[R_LAYER, g] = l
    fill(R_QKV_L, R_QKV_T, K_QKV)
    fill(R_O_L, R_O_T, K_O)
    fill(R_G_L, R_G_T, K_GU)
    fill(None, R_U_T, K_GU)
    fill(R_D_L, R_D_T, K_DN)
    fill(None, R_PROJ_T, K_PROJ)
    return tabs


def _kernel(
    tabs_ref,  # SMEM [12, G]
    pos_ref,  # SMEM [1] — absolute cache position of this token
    # --- inputs (VMEM blocks) ---
    x_ref,  # [1, Ht] token embedding (talker space)
    projw_ref,  # [Ht, TP] proj tile
    projb_ref,  # [nH, TP] f32 (pre-tiled to match xp_scr)
    innorm_ref,  # [1, nH, TH] layer slice of input_norm (tiled)
    postnorm_ref,  # [1, nH, TH]
    qnorm_ref,  # [1, 1, D]
    knorm_ref,  # [1, 1, D]
    fnorm_ref,  # [nH, TH] (const, tiled)
    cos_ref,  # [1, D] (const)
    sin_ref,  # [1, D]
    rot_ref,  # [D, D] f32 — rotate-half as a matrix (x @ R == rotate_half(x))
    qkvw_ref,  # [1, HPT, nH, TH, D] — head-major qkv tile (HPT heads)
    ow_ref,  # [1, NH, D, TO] — head-major o tile
    gw_ref,  # [1, nH, TH, TG] gate tile
    uw_ref,  # [1, nH, TH, TG] up tile
    dw_ref,  # [1, TD, nH, TH] down tile
    kc_in,  # [L, S, KVH, D] (aliased; kernel uses the OUTPUT refs only)
    vc_in,
    # --- outputs ---
    h_ref,  # [nH, TH] final hidden (caller reshapes to [1, Hp])
    kc_ref,  # [L, S, KVH, D] — the live cache (aliased with kc_in)
    vc_ref,
    # --- scratch ---
    xp_scr,  # [nH, TH] f32 residual stream
    hn_scr,  # [nH, TH] f32 normed activations
    qv_scr,  # [NHtot, D] f32 — q|k|v head rows (NHtot = NH + 2*KVH)
    attn_scr,  # [NH, D] f32
    act_scr,  # [gu_t, TG] f32
    dacc_scr,  # [nH, TH] f32
    *,
    spec,
    eps: float,
    scale: float,
    n_steps: int,
):
    g = pl.program_id(0)
    kind = tabs_ref[R_KIND, g]
    layer = tabs_ref[R_LAYER, g]
    pos = pos_ref[0]
    D, KVH, NH, HPT = spec["D"], spec["KVH"], spec["NH"], spec["HPT"]
    nH, TH = spec["nH"], spec["TH"]
    Gh = NH // KVH
    S = kc_ref.shape[1]
    dt = x_ref.dtype

    def rms_tiled(t, w):
        """RMS-normalize the full tiled [nH, TH] vector."""
        var = jnp.mean(t * t)
        return t * jax.lax.rsqrt(var + eps) * w

    def mv(a, w):  # [1, K] f32 × [K, N] → [1, N] f32
        return jax.lax.dot_general(
            a.astype(dt), w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(kind == K_PROJ)
    def _():
        t = tabs_ref[R_PROJ_T, g]
        y = mv(x_ref[...].astype(jnp.float32), projw_ref[...])
        xp_scr[t] = y[0] + projb_ref[t]

    @pl.when(kind == K_QKV)
    def _():
        t = tabs_ref[R_QKV_T, g]

        @pl.when(t == 0)
        def _():
            hn_scr[...] = rms_tiled(xp_scr[...], innorm_ref[0])

        for i in range(HPT):  # static unroll: one matvec per head in the tile
            acc = jnp.zeros((1, D), jnp.float32)
            for n in range(nH):
                acc = acc + mv(hn_scr[n][None], qkvw_ref[0, i, n])
            qv_scr[t * HPT + i] = acc[0]

    @pl.when(kind == K_ATTN)
    def _():
        qv = qv_scr[...]  # [NHtot, D] f32

        def headnorm(rows, w_ref):
            var = jnp.mean(rows * rows, axis=-1, keepdims=True)
            return rows * jax.lax.rsqrt(var + eps) * w_ref[0].astype(
                jnp.float32)

        cos = cos_ref[...].astype(jnp.float32)
        sin = sin_ref[...].astype(jnp.float32)
        rot = rot_ref[...]

        def rope(rows):  # rotate_half via the constant matrix — no lane slicing
            return rows * cos + jax.lax.dot_general(
                rows, rot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * sin

        q = rope(headnorm(qv[:NH], qnorm_ref))  # [NH, D]
        k = rope(headnorm(qv[NH:NH + KVH], knorm_ref))  # [KVH, D]
        v = qv[NH + KVH:]  # [KVH, D] — stored raw (models/layers.py:149)

        kc_ref[layer, pos] = k.astype(kc_ref.dtype)
        vc_ref[layer, pos] = v.astype(vc_ref.dtype)

        kcache = kc_ref[layer]  # [S, KVH, D]
        vcache = vc_ref[layer]
        idx = jax.lax.broadcasted_iota(jnp.int32, (Gh, S), 1)
        for h in range(KVH):  # static per-kv-head attention
            qh = q[h * Gh:(h + 1) * Gh]  # [Gh, D]
            kh = kcache[:, h, :].astype(jnp.float32)  # [S, D]
            vh = vcache[:, h, :].astype(jnp.float32)
            sc = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # [Gh, S]
            sc = jnp.where(idx <= pos, sc, -1e30)
            m = jnp.max(sc, axis=-1, keepdims=True)
            p = jnp.exp(sc - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            out = jax.lax.dot_general(
                p.astype(jnp.float32), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [Gh, D]
            attn_scr[h * Gh:(h + 1) * Gh] = out

    @pl.when(kind == K_O)
    def _():
        t = tabs_ref[R_O_T, g]
        y = jnp.zeros((1, spec["TO"]), jnp.float32)
        for h in range(NH):  # static: per-head o-projection slice
            y = y + mv(attn_scr[h][None], ow_ref[0, h])
        xp_scr[t] = xp_scr[t] + y[0]

    @pl.when(kind == K_GU)
    def _():
        t = tabs_ref[R_G_T, g]

        @pl.when(t == 0)
        def _():
            hn_scr[...] = rms_tiled(xp_scr[...], postnorm_ref[0])
            dacc_scr[...] = jnp.zeros_like(dacc_scr)

        gt = jnp.zeros((1, spec["TG"]), jnp.float32)
        ut = jnp.zeros((1, spec["TG"]), jnp.float32)
        for n in range(nH):
            gt = gt + mv(hn_scr[n][None], gw_ref[0, n])
            ut = ut + mv(hn_scr[n][None], uw_ref[0, n])
        a = gt * jax.nn.sigmoid(gt) * ut
        act_scr[t] = a[0]

    @pl.when(kind == K_DN)
    def _():
        t = tabs_ref[R_D_T, g]
        a = act_scr[t][None]
        for n in range(nH):
            dacc_scr[n] = dacc_scr[n] + mv(a, dw_ref[0, :, n])[0]

        @pl.when(t == spec["dn_t"] - 1)
        def _():
            xp_scr[...] = xp_scr[...] + dacc_scr[...]

    @pl.when(g == n_steps - 1)
    def _():
        h_ref[...] = rms_tiled(xp_scr[...], fnorm_ref[...]).astype(h_ref.dtype)


def relayout_micro_kernel_weights(
    blocks: Dict[str, jnp.ndarray],
    proj_b: jnp.ndarray,
    final_norm: jnp.ndarray,
    D: int,
    KVH: int,
    tile: int = 256,
    hpt: int = 4,
) -> Dict[str, jnp.ndarray]:
    """One-time head-major / tiled relayout of the predictor weights for
    fused_micro_step.  MUST be called once outside the decode loop — doing
    the transposes inside a jitted per-step call would re-emit ~77 MB of
    relayout work every micro-step (jit caches compiled code, not computed
    values)."""
    L, Hp, QT = blocks["qkv_proj"].shape
    NHtot = QT // D
    NH = blocks["o_proj"].shape[1] // D
    I = blocks["down_proj"].shape[1]
    TH = min(tile, Hp)
    nH = Hp // TH
    HPT = min(hpt, NHtot)
    assert NHtot % HPT == 0 and Hp % TH == 0 and I % min(tile, I) == 0
    rot = np.zeros((D, D), np.float32)  # x @ rot == rotate_half(x)
    half = D // 2
    rot[half:, :half] = -np.eye(half, dtype=np.float32)  # -x2 → first half
    rot[:half, half:] = np.eye(half, dtype=np.float32)  # x1 → second half
    return {
        "qkv_hm": blocks["qkv_proj"].reshape(L, nH, TH, NHtot, D)
                                    .transpose(0, 3, 1, 2, 4),
        "o_hm": blocks["o_proj"].reshape(L, NH, D, Hp),
        "gu_tiled": blocks["gateup_proj"].reshape(L, nH, TH, 2 * I),
        "dn_tiled": blocks["down_proj"].reshape(L, I, nH, TH),
        "in_norm": blocks["input_norm"].reshape(L, nH, TH),
        "post_norm": blocks["post_norm"].reshape(L, nH, TH),
        "q_norm": blocks["q_norm"][:, None],
        "k_norm": blocks["k_norm"][:, None],
        "proj_b": proj_b.reshape(nH, TH).astype(jnp.float32),
        "final_norm": final_norm.reshape(nH, TH),
        "rot": jnp.asarray(rot),
    }


@functools.partial(jax.jit,
                   static_argnames=("eps", "interpret", "tile", "hpt"))
def fused_micro_step(
    hm: Dict[str, jnp.ndarray],  # relayout_micro_kernel_weights output
    proj_w: jnp.ndarray,  # [Ht, Hp]
    x_emb: jnp.ndarray,  # [1, Ht] token embedding
    cos: jnp.ndarray,  # [D] rope cos for this position
    sin: jnp.ndarray,
    kv_k: jnp.ndarray,  # [L, S, KVH, D] (batch-1, squeezed)
    kv_v: jnp.ndarray,
    pos: jnp.ndarray,  # scalar int32
    *,
    eps: float = 1e-6,
    interpret: bool = False,
    tile: int = 256,  # 512-tile VMEM footprint measured 21.8M > 16M limit
    hpt: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One predictor micro-step.  Returns (h [1, Hp], kv_k', kv_v')."""
    L, S, KVH, D = kv_k.shape
    Ht, Hp = proj_w.shape
    _, NHtot, nH, TH, _ = hm["qkv_hm"].shape
    NH = hm["o_hm"].shape[1]
    I = hm["dn_tiled"].shape[1]
    qkv_hm, o_hm = hm["qkv_hm"], hm["o_hm"]
    gu_tiled, dn_tiled = hm["gu_tiled"], hm["dn_tiled"]

    HPT = min(hpt, NHtot)
    TQ_t = NHtot // HPT
    TO = TH
    TG = TD = min(tile, I)
    proj_t, o_t = nH, nH
    gu_t = I // TG
    dn_t = I // TD

    tabs = _build_schedule(L, TQ_t, o_t, gu_t, dn_t, proj_t)
    G = tabs.shape[1]
    spec = dict(TH=TH, nH=nH, TO=TO, TG=TG, TD=TD, D=D, KVH=KVH, NH=NH,
                HPT=HPT, dn_t=dn_t)

    if not interpret and jax.default_backend() == "cpu":
        interpret = True

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, Ht), lambda g, t, p: (0, 0)),  # x_emb
            pl.BlockSpec((Ht, TH), lambda g, t, p: (0, t[R_PROJ_T, g])),
            pl.BlockSpec((nH, TH), lambda g, t, p: (0, 0)),  # proj_b
            pl.BlockSpec((1, nH, TH), lambda g, t, p: (t[R_LAYER, g], 0, 0)),
            pl.BlockSpec((1, nH, TH), lambda g, t, p: (t[R_LAYER, g], 0, 0)),
            pl.BlockSpec((1, 1, D), lambda g, t, p: (t[R_LAYER, g], 0, 0)),
            pl.BlockSpec((1, 1, D), lambda g, t, p: (t[R_LAYER, g], 0, 0)),
            pl.BlockSpec((nH, TH), lambda g, t, p: (0, 0)),  # final_norm
            pl.BlockSpec((1, D), lambda g, t, p: (0, 0)),  # cos
            pl.BlockSpec((1, D), lambda g, t, p: (0, 0)),  # sin
            pl.BlockSpec((D, D), lambda g, t, p: (0, 0)),  # rot
            pl.BlockSpec((1, HPT, nH, TH, D),
                         lambda g, t, p: (t[R_QKV_L, g], t[R_QKV_T, g], 0, 0,
                                          0)),
            pl.BlockSpec((1, NH, D, TO),
                         lambda g, t, p: (t[R_O_L, g], 0, 0, t[R_O_T, g])),
            pl.BlockSpec((1, nH, TH, TG),
                         lambda g, t, p: (t[R_G_L, g], 0, 0, t[R_G_T, g])),
            pl.BlockSpec((1, nH, TH, TG),
                         lambda g, t, p: (t[R_G_L, g], 0, 0,
                                          I // TG + t[R_U_T, g])),
            pl.BlockSpec((1, TD, nH, TH),
                         lambda g, t, p: (t[R_D_L, g], t[R_D_T, g], 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # kv_k (resident, aliased)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # kv_v
        ],
        out_specs=[
            pl.BlockSpec((nH, TH), lambda g, t, p: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((nH, TH), jnp.float32),  # xp
            pltpu.VMEM((nH, TH), jnp.float32),  # hn
            pltpu.VMEM((NHtot, D), jnp.float32),  # qv head rows
            pltpu.VMEM((NH, D), jnp.float32),  # attn
            pltpu.VMEM((gu_t, TG), jnp.float32),  # act
            pltpu.VMEM((nH, TH), jnp.float32),  # down acc
        ],
    )
    h, kk, vv = pl.pallas_call(
        functools.partial(_kernel, spec=spec, eps=eps, scale=D**-0.5,
                          n_steps=G),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nH, TH), x_emb.dtype),
            jax.ShapeDtypeStruct(kv_k.shape, kv_k.dtype),
            jax.ShapeDtypeStruct(kv_v.shape, kv_v.dtype),
        ),
        input_output_aliases={18: 1, 19: 2},  # kv_k/kv_v in-place
        interpret=interpret,
    )(
        jnp.asarray(tabs),
        jnp.reshape(pos.astype(jnp.int32), (1,)),
        x_emb,
        proj_w,
        hm["proj_b"],
        hm["in_norm"],
        hm["post_norm"],
        hm["q_norm"],
        hm["k_norm"],
        hm["final_norm"],
        cos.reshape(1, D),
        sin.reshape(1, D),
        hm["rot"],
        qkv_hm,
        o_hm,
        gu_tiled,
        gu_tiled,
        dn_tiled,
        kv_k,
        kv_v,
    )
    return h.reshape(1, Hp), kk, vv
