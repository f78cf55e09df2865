from volumetric_renderer_tpu.transfer.gradient import Gradient
from volumetric_renderer_tpu.transfer.texture import sample_tf

__all__ = ["Gradient", "sample_tf"]
