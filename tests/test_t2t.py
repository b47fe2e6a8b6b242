"""T2T module: unfold parity with torch, attention golden parity, shapes."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from esvit_tpu.models.t2t import T2TAttention, T2TModule, unfold

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference tree not mounted")

from tests import ref_compat  # noqa: E402


@pytest.mark.parametrize("k,s,p", [(7, 4, 2), (3, 2, 1)])
def test_unfold_matches_torch(np_rng, k, s, p):
    x = np_rng.normal(size=(2, 5, 16, 16)).astype(np.float32)  # NCHW
    ref = torch.nn.Unfold(kernel_size=(k, k), stride=(s, s),
                          padding=(p, p))(torch.tensor(x))
    ref = ref.transpose(1, 2).numpy()                          # (B, L, C*k*k)
    got = np.asarray(unfold(jnp.asarray(x.transpose(0, 2, 3, 1)), k, s, p))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_t2t_attention_matches_reference(np_rng):
    ref_t2t = ref_compat.load_reference_module("layers.t2t")
    torch.manual_seed(0)
    dim, in_dim, N = 12, 8, 10
    ref = ref_t2t.Attention(dim, num_heads=1, in_dim=in_dim, qkv_bias=True)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "qkv": {"kernel": sd["qkv.weight"].T, "bias": sd["qkv.bias"]},
        "proj": {"kernel": sd["proj.weight"].T, "bias": sd["proj.bias"]},
    }
    ours = T2TAttention(dim, in_dim, num_heads=1, qkv_bias=True)
    x = np_rng.normal(size=(2, N, dim)).astype(np.float32)
    with torch.no_grad():
        t_out = ref(torch.tensor(x)).numpy()
    j_out = ours.apply({"params": jax.tree.map(jnp.asarray, params)},
                       jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), t_out, rtol=1e-4, atol=1e-5)


def test_t2t_module_shapes(rng, np_rng):
    """The reference's standard Token_transformer path cannot run (debug
    sys.exit landmine, t2t.py:174-176) — shape/finiteness checks here."""
    m = T2TModule(embed_dim=48, token_dim=16)
    x = jnp.asarray(np_rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    v = m.init({"params": rng}, x, deterministic=True)
    out = m.apply(v, x, deterministic=True)
    # 32 -> /4 -> /2 -> /2 = 2x2 tokens
    assert out.shape == (2, 4, 48)
    assert np.all(np.isfinite(np.asarray(out)))
