"""Isolated DDINO-loss fwd+bwd micro-benchmark at bench shapes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from esvit_tpu import losses


def main():
    B, K, C = 32, 65536, 768
    Ng, Nl = 49, 9
    ncrops = 10
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 8)
    rows_g, rows_l = 2 * B * Ng, 8 * B * Nl

    s_cls = jax.random.normal(ks[0], (ncrops * B, K), jnp.bfloat16)
    s_reg = jax.random.normal(ks[1], (rows_g + rows_l, K), jnp.bfloat16)
    s_fea = jax.random.normal(ks[2], (rows_g + rows_l, C), jnp.bfloat16)
    t_cls = jax.random.normal(ks[3], (2 * B, K), jnp.float32)
    t_reg = jax.random.normal(ks[4], (2 * B * Ng, K), jnp.float32)
    t_fea = jax.random.normal(ks[5], (2 * B * Ng, C), jnp.float32)
    centers = losses.DinoCenters.zeros(K)

    def loss_fn(s_cls, s_reg, s_fea):
        student = (s_cls, s_reg, s_fea, (Ng, Nl))
        teacher = (t_cls, t_reg, t_fea, (Ng,))
        loss, _ = losses.ddino_loss(student, teacher, centers,
                                    jnp.float32(0.04), ncrops=ncrops,
                                    batch_size=B)
        return loss

    g = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2)))
    out = g(s_cls, s_reg, s_fea)
    _ = float(out[0].sum())
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(s_cls, s_reg, s_fea)
    _ = float(out[0].sum())
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"ddino loss fwd+bwd: {dt:.2f} ms/it")


if __name__ == "__main__":
    main()
