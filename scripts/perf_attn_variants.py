"""Probe: window-attention core variants at real Swin-T stage shapes.

Times fwd and fwd+bwd of the attention core (qkv -> attended output) on the
attached chip, amortizing the axon per-execution overhead by scanning ITERS
dependent iterations inside one jitted function.

Variants:
  v0_classic      - current production path (einsum bnhd,bmhd->bhnm, fp32 scores)
  v1_bf16         - same, bf16 score storage (fp32 MXU accumulation)
  v2_packed       - contraction-packed: 4 window-heads (hd=32) side by side in
                    a 128-deep contraction; K/V zero-expanded block-diagonally
                    so cross-unit scores vanish exactly. One (N,128)@(128,4N)
                    matmul replaces 4 (N,32)@(32,N) ones.
  v3_packed_bf16  - v2 with bf16 scores.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 49  # window tokens
HD = 32
ITERS = 10


def classic(qkv, bias, nH, scale, score_dtype):
    B_, Nn, C3 = qkv.shape
    C = C3 // 3
    hd = C // nH
    qkv_r = qkv.reshape(B_, Nn, 3, nH, hd)
    q, k, v = qkv_r[:, :, 0], qkv_r[:, :, 1], qkv_r[:, :, 2]
    attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k,
                      preferred_element_type=score_dtype)
    nWm = bias.shape[0]
    attn = (attn.reshape(B_ // nWm, nWm, nH, Nn, Nn)
            + bias[None].astype(score_dtype)).reshape(B_, nH, Nn, Nn)
    probs = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", probs.astype(qkv.dtype), v)
    return out.reshape(B_, Nn, C)


def packed(qkv, bias, nH, scale, score_dtype):
    """Pack P=4 heads of each window into one 128-deep contraction."""
    B_, Nn, C3 = qkv.shape
    C = C3 // 3
    hd = C // nH
    P = 4
    nHp = ((nH + P - 1) // P) * P  # pad heads to a multiple of P
    qkv_r = qkv.reshape(B_, Nn, 3, nH, hd)
    if nHp != nH:
        qkv_r = jnp.pad(qkv_r, ((0, 0),) * 3 + ((0, nHp - nH), (0, 0)))
    G = nHp // P
    # (B_, G, N, P*hd): group-major, heads of a group side by side on lanes
    q = qkv_r[:, :, 0].reshape(B_, Nn, G, P * hd).transpose(0, 2, 1, 3)
    k = qkv_r[:, :, 1].reshape(B_, Nn, G, P, hd).transpose(0, 2, 1, 3, 4)
    v = qkv_r[:, :, 2].reshape(B_, Nn, G, P, hd).transpose(0, 2, 1, 3, 4)
    eye = jnp.eye(P, dtype=qkv.dtype)
    # Block-diagonal zero expansion: unit i's keys live at rows i*N+j,
    # cols i*hd..(i+1)*hd, zero elsewhere -> cross-unit dots vanish.
    kexp = (k[:, :, :, :, None, :] * eye[None, None, None, :, :, None])
    kexp = kexp.transpose(0, 1, 3, 2, 4, 5).reshape(B_, G, P * Nn, P * hd)
    vexp = (v[:, :, :, :, None, :] * eye[None, None, None, :, :, None])
    vexp = vexp.transpose(0, 1, 3, 2, 4, 5).reshape(B_, G, P * Nn, P * hd)
    scores = jnp.einsum("bgnc,bgmc->bgnm", q * scale, kexp,
                        preferred_element_type=score_dtype)  # (B_,G,N,P*N)
    scores = scores.reshape(B_, G, Nn, P, Nn)
    nWm = bias.shape[0]
    bias_g = bias.reshape(1, B_ // nWm and nWm, nH, Nn, Nn)
    bias_g = bias  # (nWm, nH, N, N)
    if nHp != nH:
        bias_g = jnp.pad(bias_g, ((0, 0), (0, nHp - nH), (0, 0), (0, 0)))
    bias_g = bias_g.reshape(nWm, G, P, Nn, Nn).transpose(0, 1, 3, 2, 4)
    scores = (scores.reshape(B_ // nWm, nWm, G, Nn, P, Nn)
              + bias_g[None].astype(score_dtype))
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    probs = probs.reshape(B_, G, Nn, P * Nn).astype(qkv.dtype)
    out = jnp.einsum("bgnm,bgmc->bgnc", probs, vexp)  # (B_, G, N, P*hd)
    out = out.transpose(0, 2, 1, 3).reshape(B_, Nn, G * P, hd)[:, :, :nH]
    return out.reshape(B_, Nn, C)


def bench(fn, qkv, bias, nH, scale, score_dtype, grad):
    core = functools.partial(fn, nH=nH, scale=scale, score_dtype=score_dtype)

    if grad:
        def one(qkv):
            loss_fn = lambda x: jnp.sum(core(x, bias).astype(jnp.float32) ** 2)
            return jax.grad(loss_fn)(qkv)
    else:
        def one(qkv):
            return core(qkv, bias)

    @jax.jit
    def run(qkv):
        def body(x, _):
            y = one(x)
            # dependency chain without changing magnitude
            if y.shape != x.shape:
                y = jnp.concatenate([y, y, y], axis=-1)
            return x + 0.0 * y.astype(x.dtype), ()
        x, _ = jax.lax.scan(body, qkv, None, length=ITERS)
        return jnp.sum(x.astype(jnp.float32))

    r = run(qkv)
    _ = float(r)
    t0 = time.perf_counter()
    r = run(qkv)
    _ = float(r)
    dt = (time.perf_counter() - t0) / ITERS
    return dt * 1e3


def main():
    # (name, B_ windows both-branch at B=32 train, C, nH, nWm)
    stages = [
        ("s1", 8192, 96, 3, 64),
        ("s2", 2048, 192, 6, 16),
        ("s3", 512, 384, 12, 4),
        ("s4", 128, 768, 24, 1),
    ]
    rng = np.random.RandomState(0)
    print(f"{'stage':6} {'variant':16} {'fwd ms':>9} {'fwd+bwd ms':>11}")
    totals = {}
    for name, B_, C, nH, nWm in stages:
        qkv = jnp.asarray(rng.randn(B_, N, 3 * C), jnp.bfloat16)
        bias = jnp.asarray(rng.randn(nWm, nH, N, N), jnp.float32)
        scale = (C // nH) ** -0.5
        for vname, fn, sd in [
            ("v0_classic", classic, jnp.float32),
            ("v1_bf16", classic, jnp.bfloat16),
            ("v2_packed", packed, jnp.float32),
            ("v3_packed_bf16", packed, jnp.bfloat16),
        ]:
            fwd = bench(fn, qkv, bias, nH, scale, sd, grad=False)
            bwd = bench(fn, qkv, bias, nH, scale, sd, grad=True)
            totals.setdefault(vname, [0.0, 0.0])
            totals[vname][0] += fwd
            totals[vname][1] += bwd
            print(f"{name:6} {vname:16} {fwd:9.3f} {bwd:11.3f}")
    print("\nper-block totals across stages (x depth for full net):")
    for vname, (f, b) in totals.items():
        print(f"  {vname:16} fwd {f:7.3f} ms   fwd+bwd {b:7.3f} ms")
    # correctness spot check
    qkv = jnp.asarray(rng.randn(256, N, 3 * 96), jnp.bfloat16)
    bias = jnp.asarray(0.1 * rng.randn(16, 3, N, N), jnp.float32)
    a = classic(qkv, bias, 3, 32 ** -0.5, jnp.float32)
    b = packed(qkv, bias, 3, 32 ** -0.5, jnp.float32)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"\npacked vs classic max abs err: {err:.3e}")


if __name__ == "__main__":
    main()
