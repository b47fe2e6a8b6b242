from esvit_tpu.models.registry import build_backbone, register_backbone
