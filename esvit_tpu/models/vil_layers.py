"""Vision-Longformer attention zoo (ref: layers/).

- ``Long2DSCAttention`` — the ViL sliding-chunk attention
  (ref: layers/longformer2d.py:11-330): local q / shared kv projections,
  local-to-global + local-to-local (sliding chunk) attention concatenated
  then softmaxed, optional non-shared global projections; optional Swin-like
  RPE over the 3x3 chunk neighborhood; global-token rows do vanilla MHA over
  everything. ``mode`` (static): 0 = 8 neighbors, -1 = self only, 1..8 =
  self + sampled neighbor (training memory saver, ref :147-155).
- ``PerformerAttention`` — FAVOR+ linear attention
  (ref: layers/performer.py): softmax kernel features with an orthogonal
  random projection stored in a ``performer`` variable collection (redraw =
  re-init that collection).
- ``LinformerAttention`` — learned (seq_len x k) K/V projections
  (ref: layers/linformer.py), share_kv option.
- ``SRAttention`` — strided-conv spatial reduction of K/V + InstanceNorm
  (ref: layers/srformer.py).
- ``SELayerSeq`` / ``SELayerECA`` — sequence SE / ECA channel attention
  (ref: layers/se_layer.py:21-70).

All softmaxes subtract the row max (the reference does this explicitly for
fp16 safety) and run in fp32.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from esvit_tpu.models.common import dense, softmax_fp32, trunc_normal_init
from esvit_tpu.ops import slidingchunk as sc

Dtype = Any


@functools.lru_cache(maxsize=None)
def vil_local_rpe_index(w: int) -> np.ndarray:
    """(w^2, 9w^2) index into the ((4w-1)^2, nH) table — relative positions
    of the center chunk's queries against the 3x3 chunk neighborhood, in the
    reference's chunk concat order (longformer2d.py:69-102)."""
    coords = np.stack(np.meshgrid(np.arange(-w, 2 * w), np.arange(-w, 2 * w),
                                  indexing="ij"))            # 2, 3w, 3w
    # chunk layout: c[:, m, n, within] with within = x*w + y
    cu = coords.reshape(2, 3, w, 3, w).transpose(0, 1, 3, 2, 4).reshape(2, 3, 3, w * w)
    q = cu[:, 1, 1, :]                                       # 2, w^2
    order = [(0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (1, 2), (2, 0), (2, 1), (2, 2)]
    rel = np.concatenate(
        [q[:, :, None] - (q[:, None, :] if (a, b) == (1, 1)
                          else cu[:, a, b, :][:, None, :])
         for a, b in order], axis=-1)                        # 2, w^2, 9w^2
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += 2 * w - 1
    rel[:, :, 1] += 2 * w - 1
    rel[:, :, 0] *= 2 * 2 * w - 1
    return rel.sum(-1).astype(np.int32)


def _rpe_index_for_mode(w: int, mode: int) -> np.ndarray:
    idx = vil_local_rpe_index(w)
    w2 = w * w
    if mode == 0:
        return idx
    if mode == -1:
        return idx[:, 4 * w2:5 * w2]
    chunk_id = mode if mode > 4 else mode - 1
    return np.concatenate([idx[:, 4 * w2:5 * w2],
                           idx[:, chunk_id * w2:(chunk_id + 1) * w2]], axis=-1)


class Long2DSCAttention(nn.Module):
    dim: int
    num_heads: int
    window: int                      # chunk size w
    nglo: int = 1
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    share_w: bool = False            # share local/global projections
    only_glo: bool = False
    exact: int = 0
    rpe: bool = False
    # local-to-pooled attention (ref longformer2d.py:104-132, 194-301):
    # K/V mean-pooled per chunk become extra global-ish keys with learned
    # per-head scales; optional cross-window rpe bias.
    add_pooled: bool = False
    pool_size: int = 0               # 0 -> window size (ref default)
    # 'mean': avg-pool the raw K map with pool_size stride (ref :218-222);
    # 'fc': one pooled token per chunk via a learned Linear(W^2 -> 1) over
    # the chunk's tokens (ref longformer2d.py:111-117, 212-216).
    pool_method: str = "mean"
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    # Fused sliding-chunk Pallas kernel (ops/sliding_chunk_fused.py) for
    # the canonical mode-0/exact-0/APE configuration: 'auto' uses it on a
    # TPU backend, 'on'/'interpret' force it (interpret = CPU parity
    # tests), 'off' keeps the stacked-neighborhood einsum everywhere.
    fused_sc: str = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, nx: int, ny: int, deterministic: bool = True,
                 mode: int = 0):
        B, N, C = x.shape
        H, W = self.num_heads, self.window
        M = C // H
        W2 = W * W
        Nglo = self.nglo
        Nloc = nx * ny
        scale = self.qk_scale or M ** -0.5
        kv_nums = {0: 9 * W2, -1: W2}.get(mode, 2 * W2)

        query = dense(C, use_bias=self.qkv_bias, dtype=self.dtype, name="query")
        kv = dense(2 * C, use_bias=self.qkv_bias, dtype=self.dtype, name="kv")
        proj = dense(C, dtype=self.dtype, name="proj")
        if Nglo >= 1 and not self.share_w:
            query_g = dense(C, use_bias=self.qkv_bias, dtype=self.dtype,
                            name="query_global")
            kv_g = dense(2 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                         name="kv_global")
            proj_g = dense(C, dtype=self.dtype, name="proj_global")
        else:
            query_g, kv_g, proj_g = query, kv, proj

        if self.rpe:
            table = self.param("local_relative_position_bias_table",
                               trunc_normal_init,
                               ((4 * W - 1) * (4 * W - 1), H), jnp.float32)
            if Nglo >= 1:
                g2l = self.param("g2l_relative_position_bias",
                                 trunc_normal_init, (2, H, Nglo), jnp.float32)
                g2g = self.param("g2g_relative_position_bias",
                                 trunc_normal_init, (H, Nglo, Nglo), jnp.float32)

        # ---- local attention -------------------------------------------
        q = (scale * query(x[:, Nglo:])).reshape(B, Nloc, H, M).transpose(0, 2, 1, 3)
        kvx = kv(x).reshape(B, N, 2, H, M).transpose(2, 0, 3, 1, 4)
        k, v = kvx[0], kvx[1]                                # (B,H,N,M)

        from esvit_tpu.ops import sliding_chunk_fused as scf

        use_fused = (
            self.fused_sc != "off"
            and scf.supports(mode, self.exact, self.rpe, self.add_pooled,
                             self.only_glo, Nglo,
                             self.attn_drop > 0.0 and not deterministic)
            and (self.fused_sc in ("on", "interpret")
                 or jax.default_backend() == "tpu"))
        if self.only_glo:
            attn1 = jnp.einsum("bhnm,bhgm->bhng", q, k[:, :, :Nglo],
                               preferred_element_type=jnp.float32)
            probs = softmax_fp32(attn1 - jnp.max(attn1, -1, keepdims=True))
            probs = nn.Dropout(self.attn_drop)(probs, deterministic=deterministic)
            x1 = jnp.einsum("bhng,bhgm->bhnm", probs.astype(self.dtype),
                            v[:, :, :Nglo])
        elif use_fused:
            out = scf.sliding_chunk_attention(
                q.reshape(B * H, nx, ny, M),
                k[:, :, Nglo:].reshape(B * H, nx, ny, M),
                v[:, :, Nglo:].reshape(B * H, nx, ny, M),
                k[:, :, :Nglo].reshape(B * H, Nglo, M),
                v[:, :, :Nglo].reshape(B * H, Nglo, M),
                nx=nx, ny=ny, W=W,
                interpret=self.fused_sc == "interpret")
            x1 = out.reshape(B, H, Nloc, M)
        else:
            def to_img(t):
                # (B,H,Nloc,M) -> (B*H, M, nx, ny) -> padded chunks
                return t.transpose(0, 1, 3, 2).reshape(B * H, M, nx, ny)

            q_img, k_img, v_img = (to_img(t) for t in
                                   (q, k[:, :, Nglo:], v[:, :, Nglo:]))
            padx = (W - nx % W) % W
            pady = (W - ny % W) % W
            mx_, my_ = (nx + padx) // W, (ny + pady) // W
            if padx or pady:
                q_img, k_img, v_img = (
                    jnp.pad(t, ((0, 0), (0, 0), (0, padx), (0, pady)))
                    for t in (q_img, k_img, v_img))

            def chunk(t):
                return t.reshape(B * H, M, mx_, W, my_, W).transpose(
                    0, 1, 2, 4, 3, 5).reshape(B * H, M, mx_, my_, W2)

            q_c, k_c, v_c = chunk(q_img), chunk(k_img), chunk(v_img)

            # local -> global (B*H, mx, my, W2, Nglo)
            attn10 = jnp.einsum("bcmnl,btc->bmnlt", q_c,
                                k[:, :, :Nglo].reshape(B * H, Nglo, M),
                                preferred_element_type=jnp.float32)
            # local -> local sliding chunk
            attn11 = sc.slidingchunk_qk(q_c, k_c, mode)

            n_pooled = 0
            if self.add_pooled:
                # K/V pooled per pool_size patch ('mean', ref :218-222) or
                # per chunk via a learned Linear over its W^2 tokens ('fc',
                # ref :111-117, 212-216); pooled scales are learned per
                # head (:108-109).
                k_scale = self.param("pooled_k_scale", nn.initializers.ones,
                                     (1, H), jnp.float32)
                q_scale = self.param("pooled_q_scale", nn.initializers.ones,
                                     (1, H), jnp.float32)
                if self.pool_method == "fc":
                    nx_p, ny_p = mx_, my_
                    n_pooled = nx_p * ny_p
                    pool_fc = dense(1, dtype=self.dtype, name="pool_fc")
                    # k_c: (B*H, M, mx, my, W2) -> (B*H, M, mx*my)
                    pooled_k = pool_fc(k_c).reshape(B * H, M, -1)
                elif self.pool_method == "mean":
                    ps = self.pool_size or W
                    nx_p = (nx + padx) // ps
                    ny_p = (ny + pady) // ps
                    n_pooled = nx_p * ny_p

                    def pool(t_img):
                        # (B*H, M, Hp, Wp) -> (B*H, M, nx_p * ny_p)
                        r = t_img.reshape(B * H, M, nx_p, ps, ny_p, ps)
                        return jnp.mean(r, axis=(3, 5)).reshape(B * H, M, -1)

                    pooled_k = pool(k_img)
                else:
                    raise ValueError(
                        f"unknown pool_method {self.pool_method!r}")
                # Reference quirk (longformer2d.py:219-222): the map lambda
                # ignores its argument, so pooled "values" are pooled KEYS.
                # Replicated for checkpoint parity.
                pooled_v = pooled_k
                ks = jnp.repeat(k_scale.astype(self.dtype), B, axis=0)
                attn12 = jnp.einsum(
                    "bcmnl,bct->bmnlt", q_c,
                    pooled_k * ks.reshape(B * H, 1, 1),
                    preferred_element_type=jnp.float32)
                if self.rpe:
                    from esvit_tpu.ops.window import relative_position_index

                    table_xwin = self.param(
                        "relative_position_bias_table_xwin",
                        trunc_normal_init,
                        ((2 * nx_p - 1) * (2 * ny_p - 1), H), jnp.float32)
                    idx_xw = relative_position_index(nx_p, ny_p)
                    bias_xw = table_xwin[idx_xw.reshape(-1)].reshape(
                        n_pooled, n_pooled, H).transpose(2, 0, 1)
                    bias_xw = bias_xw.reshape(1, H, nx_p, ny_p, 1, n_pooled)
                    attn12 = (attn12.reshape(B, H, mx_, my_, W2, n_pooled)
                              + bias_xw).reshape(B * H, mx_, my_, W2, n_pooled)

            if self.rpe:
                if Nglo >= 1:
                    bias_l2g = g2l[1].reshape(1, H, 1, 1, 1, Nglo)
                    attn10 = (attn10.reshape(B, H, mx_, my_, W2, Nglo)
                              + bias_l2g).reshape(B * H, mx_, my_, W2, Nglo)
                idx = _rpe_index_for_mode(W, mode)
                bias = table[idx.reshape(-1)].reshape(W2, kv_nums, H)
                bias = bias.transpose(2, 0, 1)               # H, W2, kv
                attn11 = (attn11.reshape(B, H, mx_, my_, W2, kv_nums)
                          + bias[None, :, None, None]).reshape(
                    B * H, mx_, my_, W2, kv_nums)

            attn11 = sc.apply_invalid_mask(attn11, mx_, my_, padx, pady, W,
                                           self.exact, mode)
            parts = [attn10, attn11]
            if self.add_pooled:
                parts.append(attn12)
            attn1 = jnp.concatenate(parts, axis=-1)
            probs = softmax_fp32(attn1 - jnp.max(attn1, -1, keepdims=True))
            probs = nn.Dropout(self.attn_drop)(probs, deterministic=deterministic)
            probs = probs.astype(self.dtype)

            x1 = sc.slidingchunk_av(
                probs[..., Nglo:Nglo + kv_nums], v_c, mode)
            if Nglo >= 1:
                x1 = x1 + jnp.einsum(
                    "bmnlt,btc->bcmnl", probs[..., :Nglo],
                    v[:, :, :Nglo].reshape(B * H, Nglo, M))
            if self.add_pooled:
                qs = jnp.repeat(q_scale.astype(self.dtype), B, axis=0)
                x1 = x1 + jnp.einsum(
                    "bmnlt,bct->bcmnl", probs[..., Nglo + kv_nums:],
                    pooled_v * qs.reshape(B * H, 1, 1))
            # chunks -> grid -> (B, H, Nloc, M)
            x1 = x1.reshape(B * H, M, mx_, my_, W, W).transpose(
                0, 1, 2, 4, 3, 5).reshape(B * H, M, mx_ * W, my_ * W)
            x1 = x1[:, :, :nx, :ny].reshape(B, H, M, Nloc).transpose(0, 1, 3, 2)

        x1 = x1.transpose(0, 2, 1, 3).reshape(B, Nloc, C)
        x1 = proj(x1)
        x1 = nn.Dropout(self.proj_drop)(x1, deterministic=deterministic)
        if Nglo == 0:
            return x1

        # ---- global attention (vanilla MHA over all tokens) -------------
        qg = (scale * query_g(x[:, :Nglo])).reshape(B, Nglo, H, M).transpose(0, 2, 1, 3)
        kvg = kv_g(x).reshape(B, N, 2, H, M).transpose(2, 0, 3, 1, 4)
        kg, vg = kvg[0], kvg[1]
        attn0 = jnp.einsum("bhgm,bhnm->bhgn", qg, kg,
                           preferred_element_type=jnp.float32)
        if self.rpe:
            gb = jnp.concatenate(
                [g2g, jnp.broadcast_to(g2l[0][:, :, None], (H, Nglo, Nloc))],
                axis=-1)                                     # H, Nglo, N
            attn0 = attn0 + gb[None]
        probs0 = softmax_fp32(attn0 - jnp.max(attn0, -1, keepdims=True))
        probs0 = nn.Dropout(self.attn_drop)(probs0, deterministic=deterministic)
        x0 = jnp.einsum("bhgn,bhnm->bhgm", probs0.astype(self.dtype), vg)
        x0 = x0.transpose(0, 2, 1, 3).reshape(B, Nglo, C)
        x0 = proj_g(x0)
        x0 = nn.Dropout(self.proj_drop)(x0, deterministic=deterministic)
        return jnp.concatenate([x0, x1], axis=1)


class PerformerAttention(nn.Module):
    """FAVOR+ linear attention (ref: layers/performer.py:27-204)."""

    dim: int
    num_heads: int
    nb_features: int = 256
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    def _projection(self, m: int, d: int) -> jnp.ndarray:
        """Orthogonal random feature matrix (m, d), rows scaled to the
        chi distribution like the scipy/ortho_group reference (:77-103)."""
        return self.variable(
            "performer", "projection",
            lambda: _orthogonal_gaussian(jax.random.PRNGKey(0), m, d)).value

    @nn.compact
    def __call__(self, x, nx: int = None, ny: int = None,
                 deterministic: bool = True):
        B, N, C = x.shape
        H = self.num_heads
        M = C // H
        qkv = dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                    name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, M).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        proj_mat = self._projection(self.nb_features, M).astype(jnp.float32)
        qp = _softmax_kernel(q.astype(jnp.float32), proj_mat, is_query=True)
        kp = _softmax_kernel(k.astype(jnp.float32), proj_mat, is_query=False)

        # linear attention (ref :109-114)
        d_inv = 1.0 / jnp.einsum("bhnf,bhf->bhn", qp, kp.sum(axis=2) + 1e-8)
        context = jnp.einsum("bhnf,bhnm->bhfm", kp, v.astype(jnp.float32))
        out = jnp.einsum("bhnf,bhfm,bhn->bhnm", qp, context, d_inv)
        out = out.astype(self.dtype).transpose(0, 2, 1, 3).reshape(B, N, C)
        out = dense(C, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


def _orthogonal_gaussian(rng, m: int, d: int) -> jnp.ndarray:
    """Block-orthogonal gaussian features with chi-distributed row norms."""
    blocks = []
    n_full = m // d
    for i in range(n_full + 1):
        rows = d if i < n_full else m - n_full * d
        if rows == 0:
            continue
        g = jax.random.normal(jax.random.fold_in(rng, i), (d, d))
        qmat, _ = jnp.linalg.qr(g)
        blocks.append(qmat[:rows])
    proj = jnp.concatenate(blocks, axis=0)                    # (m, d)
    norms = jnp.sqrt(jnp.sum(
        jax.random.normal(jax.random.fold_in(rng, 999), (m, d)) ** 2, axis=1))
    return proj * norms[:, None]


def _softmax_kernel(data, projection, *, is_query: bool, eps: float = 1e-4):
    """FAVOR+ positive softmax features (ref performer.py:27-55)."""
    normalizer = data.shape[-1] ** -0.25
    ratio = projection.shape[0] ** -0.5
    dash = jnp.einsum("bhnd,jd->bhnj", normalizer * data, projection)
    diag = jnp.sum(data ** 2, axis=-1, keepdims=True) / 2.0 * normalizer ** 2
    if is_query:
        stab = jnp.max(dash, axis=-1, keepdims=True)
    else:
        stab = jnp.max(dash)
    return ratio * (jnp.exp(dash - diag - stab) + eps)


def redraw_performer_projection(variables: dict, rng) -> dict:
    """Redraw all performer projections (ref :142-146 redraw bookkeeping)."""
    if "performer" not in variables:
        return variables

    def redraw(leaf):
        return _orthogonal_gaussian(rng, *leaf.shape)

    new = jax.tree.map(redraw, variables["performer"])
    return {**variables, "performer": new}


class LinformerAttention(nn.Module):
    """Low-rank K/V projection attention (ref: layers/linformer.py:15-71)."""

    dim: int
    seq_len: int
    num_feats: int = 256
    num_heads: int = 8
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    share_kv: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, nx: int = None, ny: int = None,
                 deterministic: bool = True):
        B, N, C = x.shape
        H = self.num_heads
        M = C // H
        kdim = self.num_feats
        assert N == self.seq_len, f"linformer needs seq_len={self.seq_len}, got {N}"
        scale = self.qk_scale or M ** -0.5

        init_unif = nn.initializers.uniform(scale=2.0 / np.sqrt(kdim))

        def proj_param(name):
            # uniform(-1/sqrt(k), 1/sqrt(k)) like the reference init_ (:8-12)
            p = self.param(name, init_unif, (self.seq_len, kdim), jnp.float32)
            return p - 1.0 / np.sqrt(kdim)

        proj_k = proj_param("proj_k")
        proj_v = proj_k if self.share_kv else proj_param("proj_v")

        q = (scale * dense(C, use_bias=self.qkv_bias, dtype=self.dtype,
                           name="query")(x)).reshape(B, N, H, M).transpose(0, 2, 1, 3)
        kv = dense(2 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                   name="kv")(x).reshape(B, N, 2, C).transpose(2, 0, 1, 3)
        keys = jnp.einsum("bnd,nk->bkd", kv[0], proj_k.astype(self.dtype))
        values = jnp.einsum("bnd,nk->bkd", kv[1], proj_v.astype(self.dtype))
        # split the full dim into per-head slices (ref merge_key_values)
        keys = keys.reshape(B, kdim, H, M).transpose(0, 2, 1, 3)
        values = values.reshape(B, kdim, H, M).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhnm,bhkm->bhnk", q, keys,
                          preferred_element_type=jnp.float32)
        probs = softmax_fp32(attn - jnp.max(attn, -1, keepdims=True))
        probs = nn.Dropout(self.attn_drop)(probs, deterministic=deterministic)
        out = jnp.einsum("bhnk,bhkm->bhnm", probs.astype(self.dtype), values)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = dense(C, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class SRAttention(nn.Module):
    """Spatial-reduction attention (ref: layers/srformer.py:5-58)."""

    dim: int
    rratio: int = 2
    num_heads: int = 8
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, nx: int, ny: int, deterministic: bool = True):
        B, N, C = x.shape
        H = self.num_heads
        M = C // H
        scale = self.qk_scale or M ** -0.5
        r = self.rratio

        q = (scale * dense(C, use_bias=self.qkv_bias, dtype=self.dtype,
                           name="query")(x)).reshape(B, N, H, M).transpose(0, 2, 1, 3)

        # strided-conv downsample of the local grid + InstanceNorm
        x_loc = x[:, -nx * ny:].reshape(B, nx, ny, C)
        x_loc = nn.Conv(C, (r, r), strides=(r, r), padding="VALID",
                        use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32,
                        kernel_init=trunc_normal_init, name="proj_sr")(x_loc)
        mean = jnp.mean(x_loc, axis=(1, 2), keepdims=True)
        var = jnp.var(x_loc, axis=(1, 2), keepdims=True)
        x_loc = ((x_loc - mean) / jnp.sqrt(var + 1e-5)).astype(self.dtype)
        x_red = jnp.concatenate(
            [x[:, :-nx * ny], x_loc.reshape(B, -1, C)], axis=1)

        kv = dense(2 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                   name="kv")(x_red)
        K = x_red.shape[1]
        kv = kv.reshape(B, K, 2, H, M).transpose(2, 0, 3, 1, 4)
        keys, values = kv[0], kv[1]

        attn = jnp.einsum("bhnm,bhkm->bhnk", q, keys,
                          preferred_element_type=jnp.float32)
        probs = softmax_fp32(attn - jnp.max(attn, -1, keepdims=True))
        probs = nn.Dropout(self.attn_drop)(probs, deterministic=deterministic)
        out = jnp.einsum("bhnk,bhkm->bhnm", probs.astype(self.dtype), values)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = dense(C, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class SELayerSeq(nn.Module):
    """Sequence squeeze-excitation (ref: se_layer.py:21-38). Input (B,N,C)."""

    dim: int
    mlp_ratio: float = 0.0625
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.mlp_ratio)
        y = jnp.mean(x, axis=1)                               # (B, C)
        y = dense(hidden, use_bias=False, dtype=self.dtype, name="fc1")(y)
        y = jax.nn.relu(y)
        y = dense(self.dim, use_bias=False, dtype=self.dtype, name="fc2")(y)
        return x * jax.nn.sigmoid(y)[:, None, :]


class SELayerECA(nn.Module):
    """ECA channel attention (ref: se_layer.py:41-70). Input (B,N,C)."""

    dim: int
    k_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=1)                               # (B, C)
        pad = (self.k_size - 1) // 2
        y = nn.Conv(1, (self.k_size,), padding=[(pad, pad)], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv")(y[:, :, None])               # (B, C, 1)
        return x * jax.nn.sigmoid(y[:, None, :, 0])
