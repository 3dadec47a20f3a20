#!/usr/bin/env python3
"""Matvec weight-streaming probe: how fast can one chip read weights?

Batch-1 decode is a chain of [1,K]x[K,N] matvecs; the whole step is bound by
streaming the weight matrices from HBM.  benchmarks/decompose.py measured the
talker step at ~215 GB/s — far under the ~800 GB/s HBM peak — so this probe
times isolated strategies to find where the loss comes from:

  xla_1row      y = x @ W                  (what the model does today)
  xla_8row      y = X8 @ W                 (padded-row variant)
  xla_pre_t     y = W_t @ x_t              ([N,K] layout, contraction on K)
  pallas_mv     Pallas kernel streaming W in [K, bn] tiles
  pallas_mv_kt  Pallas kernel over W_t [N,K] tiles (rows = lanes)

Run: python benchmarks/matvec_probe.py [--k 1024] [--n 65536] [--iters 30]
"""
from __future__ import annotations

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, iters):
    jax.block_until_ready(fn())
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def inner_loop(mv, T, K):
    """Wrap a matvec in a serial in-program loop: per-call dispatch on the
    tunneled runtime (~1.2 ms) swamps sub-ms device times, so the honest
    device number is (one program containing T dependent matvecs) / T.
    The x→y→x dependency forces sequential execution; w stays in HBM
    (way over VMEM) so every iteration re-streams it."""

    def run(x, w):
        def body(i, xc):
            y = mv(xc, w)
            return xc + y.reshape(1, -1)[:, :K].astype(xc.dtype) * 1e-30

        return jax.lax.fori_loop(0, T, body, x)

    return jax.jit(run)


def pallas_mv(x, w, bn):
    """x [1,K] @ w [K,N] — grid over N/bn blocks, full-K tiles."""
    K, N = w.shape

    def kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                           preferred_element_type=jnp.float32).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((1, K), lambda i: (0, 0)),
            pl.BlockSpec((K, bn), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((1, bn), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, N), x.dtype),
    )(x, w)


def pallas_mv_kt(x, wt, bm):
    """x [1,K] with w_t [N,K]: out rows = sum over K on the lane axis."""
    N, K = wt.shape

    def kernel(x_ref, w_ref, o_ref):
        acc = jnp.sum(w_ref[:] * x_ref[:], axis=1, keepdims=True)  # [bm,1]
        o_ref[:] = acc.astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(N // bm,),
        in_specs=[
            pl.BlockSpec((1, K), lambda i: (0, 0)),
            pl.BlockSpec((bm, K), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bm, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
    )(x, wt)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=1024)
    p.add_argument("--n", type=int, default=65536)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--inner", type=int, default=20, help="matvecs per program")
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    dt = jnp.dtype(args.dtype)
    K, N = args.k, args.n
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(K, N), dt)
    wt = jnp.asarray(np.ascontiguousarray(np.asarray(w, np.float32).T), dt)
    x = jnp.asarray(rs.randn(1, K), dt)
    x8 = jnp.asarray(rs.randn(8, K), dt)
    gb = K * N * dt.itemsize / 1e9

    T = args.inner
    cases = {
        "xla_1row": (inner_loop(lambda a, ww: a @ ww, T, K), x, w),
        "xla_8row": (inner_loop(lambda a, ww: a @ ww, T, K), x8, w),
        "xla_pre_t": (inner_loop(lambda a, ww: (ww @ a.reshape(-1)[:K])[None, :], T, K), x, wt),
        "pallas_mv_bn512": (inner_loop(functools.partial(pallas_mv, bn=512), T, K), x, w),
        "pallas_mv_bn2048": (inner_loop(functools.partial(pallas_mv, bn=2048), T, K), x, w),
        "pallas_kt_bm1024": (inner_loop(
            lambda a, ww: pallas_mv_kt(a, ww, 1024).reshape(1, -1), T, K), x, wt),
    }
    results = {}
    for name, (fn, a, ww) in cases.items():
        try:
            t = timeit(lambda: fn(a, ww), args.iters) / T
            results[name] = {"ms": round(t * 1e3, 3), "GBps": round(gb / t, 1)}
            log(name, results[name])
        except Exception as e:
            log(f"{name} failed: {type(e).__name__}: {str(e)[:200]}")

    out = {"device": str(jax.devices()[0]), "K": K, "N": N,
           "dtype": args.dtype, "weight_GB": round(gb, 3), "results": results}
    log(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
