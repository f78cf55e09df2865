from volumetric_renderer_tpu.utils.config import RenderSettings
from volumetric_renderer_tpu.utils import quaternion
from volumetric_renderer_tpu.utils import color

__all__ = ["RenderSettings", "quaternion", "color"]
