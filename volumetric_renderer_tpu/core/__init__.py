from volumetric_renderer_tpu.core.sampling import trilinear_sample
from volumetric_renderer_tpu.core.marcher import march_rays, render_oracle

__all__ = ["trilinear_sample", "march_rays", "render_oracle"]
