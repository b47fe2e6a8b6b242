"""End-to-end training-math parity: loss AND gradients vs the reference.

Builds the reference torch EsViT (femto Swin + DINO heads + DDINOLoss),
imports identical weights into our model, feeds an identical multi-crop
batch, and compares the loss value and the gradients of every parameter.
This validates the entire differentiable path — model forward, loss math,
and backprop — in one shot.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from esvit_tpu import config, losses
from esvit_tpu.io import torch_import
from esvit_tpu.models.esvit import EsViTModel

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference tree not mounted")]

from tests import ref_compat  # noqa: E402


def test_loss_and_gradients_match_reference(np_rng):
    ref_swin = ref_compat.load_reference_module("models.swin_transformer")
    ref_vit = ref_compat.load_reference_module("models.vision_transformer")

    torch.manual_seed(0)
    B, K = 3, 32
    student_t = ref_swin.SwinTransformer(
        img_size=32, patch_size=4, num_classes=0, embed_dim=16,
        depths=[2, 2], num_heads=[2, 2], window_size=4, drop_path_rate=0.0,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
        use_dense_prediction=True)
    student_t.head = ref_vit.DINOHead(32, K, use_bn=False,
                                      norm_last_layer=False,
                                      hidden_dim=24, bottleneck_dim=8)
    student_t.head_dense = ref_vit.DINOHead(32, K, use_bn=False,
                                            norm_last_layer=False,
                                            hidden_dim=24, bottleneck_dim=8)
    student_t.train()
    sd = {k: v.detach().numpy() for k, v in student_t.state_dict().items()}

    # teacher = copy of student (like main_esvit.py:379)
    teacher_t = ref_swin.SwinTransformer(
        img_size=32, patch_size=4, num_classes=0, embed_dim=16,
        depths=[2, 2], num_heads=[2, 2], window_size=4, drop_path_rate=0.0,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
        use_dense_prediction=True)
    teacher_t.head = ref_vit.DINOHead(32, K, use_bn=False, hidden_dim=24,
                                      bottleneck_dim=8, norm_last_layer=False)
    teacher_t.head_dense = ref_vit.DINOHead(32, K, use_bn=False, hidden_dim=24,
                                            bottleneck_dim=8,
                                            norm_last_layer=False)
    teacher_t.load_state_dict(student_t.state_dict())
    teacher_t.eval()
    for p in teacher_t.parameters():
        p.requires_grad = False

    ncrops = 4  # 2 global + 2 local

    def torch_ddino(student_out, teacher_out, t_temp=0.04, s_temp=0.1):
        """Clean-room DDINOLoss math (validated against the reference in
        test_losses.py), operating on the model 4-tuples."""
        import torch.nn.functional as F

        s_cls, s_region, s_fea, s_npatch = student_out
        t_cls_o, t_region_o, t_fea_o, t_npatch = teacher_out
        N = t_npatch[0]
        q_cls = F.softmax(t_cls_o / t_temp, -1).detach().chunk(2)
        q_reg = F.softmax(t_region_o / t_temp, -1).detach().view(2, B, N, -1)
        t_fea_v = t_fea_o.detach().view(2, B, N, -1)
        s_cls_v = (s_cls / s_temp).chunk(ncrops)
        patches = [s_npatch[0]] * 2 + [s_npatch[1]] * (ncrops - 2)
        offs = np.cumsum([0] + [p * B for p in patches])
        total, n = 0.0, 0
        for iq in range(2):
            for v in range(ncrops):
                if v == iq:
                    continue
                lv = 0.5 * (-q_cls[iq] * F.log_softmax(s_cls_v[v], -1)).sum(-1)
                sr = (s_region[offs[v]:offs[v + 1]] / s_temp).view(
                    B, patches[v], -1)
                sf = s_fea[offs[v]:offs[v + 1]].view(B, patches[v], -1)
                sim = torch.matmul(F.normalize(sf, dim=-1),
                                   F.normalize(t_fea_v[iq], dim=-1)
                                   .transpose(1, 2))
                ind = sim.max(-1)[1]
                t_sel = torch.gather(
                    q_reg[iq], 1,
                    ind.unsqueeze(-1).expand(-1, -1, q_reg.shape[-1]))
                lg = (-t_sel * F.log_softmax(sr, -1)).sum(-1).mean(-1)
                total = total + (lv + 0.5 * lg).mean()
                n += 1
        return total / n

    g = np_rng.normal(size=(2 * B, 3, 32, 32)).astype(np.float32)
    l = np_rng.normal(size=(2 * B, 3, 16, 16)).astype(np.float32)

    # ---- reference side --------------------------------------------------
    gt = torch.tensor(g)
    lt = torch.tensor(l)
    crops_t = list(gt.chunk(2)) + list(lt.chunk(2))
    teacher_out_t = teacher_t(crops_t[:2])
    student_out_t = student_t(crops_t)
    loss_t = torch_ddino(student_out_t, teacher_out_t)
    loss_t.backward()
    t_grads = {k: p.grad.detach().numpy()
               for k, p in student_t.named_parameters() if p.grad is not None}

    # ---- our side --------------------------------------------------------
    head_cfg = config.HeadConfig(out_dim=K, hidden_dim=24, bottleneck_dim=8,
                                 norm_last_layer=False)
    model = EsViTModel(config.swin_femto(), head_cfg,
                       use_dense_prediction=True, dtype=jnp.float32)
    params = torch_import.import_esvit_model(sd, "swin")["params"]
    params = jax.tree.map(jnp.asarray, params)
    crops_j = (jnp.asarray(g.transpose(0, 2, 3, 1)),
               jnp.asarray(l.transpose(0, 2, 3, 1)))
    centers = losses.DinoCenters.zeros(K)

    t_out = model.apply({"params": params}, (crops_j[0],), deterministic=True)

    def loss_fn(p):
        s_out = model.apply({"params": p}, crops_j, deterministic=True)
        loss, _ = losses.ddino_loss(s_out, t_out, centers, 0.04,
                                    ncrops=ncrops, batch_size=B)
        return loss

    loss_j, grads = jax.value_and_grad(loss_fn)(params)

    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               rtol=1e-5)

    # Compare every gradient through the importer's name mapping: import
    # maps torch->flax, so map each torch grad and look it up in our tree.
    mapped = torch_import.import_esvit_model(t_grads, "swin")["params"]

    def compare(mapped_node, ours_node, path=""):
        if not isinstance(mapped_node, dict):
            np.testing.assert_allclose(
                np.asarray(mapped_node), np.asarray(ours_node),
                rtol=5e-3, atol=2e-5, err_msg=path)
            return 1
        n = 0
        for k in mapped_node:
            n += compare(mapped_node[k], ours_node[k], f"{path}/{k}")
        return n

    n_checked = compare(mapped, grads)
    assert n_checked > 50   # every parameter tensor was compared
