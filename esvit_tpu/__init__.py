"""esvit_tpu — a TPU-native EsViT framework (JAX / Flax / pjit / Pallas).

Self-supervised vision-transformer pre-training (DINO / EsViT recipe) with
multi-stage backbones (Swin, CvT, Vision Longformer, ViT, ResNet), view- and
region-level distillation losses, mesh-parallel training over ICI, and k-NN /
linear evaluation protocols.

Reference capability surface: microsoft/esvit (see SURVEY.md). This is a
ground-up TPU-first design, not a port.
"""

__version__ = "0.1.0"

from esvit_tpu import config as config
from esvit_tpu import losses as losses
