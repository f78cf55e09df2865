from volumetric_renderer_tpu.data.volume import Volume
from volumetric_renderer_tpu.data.importer import import_volume

__all__ = ["Volume", "import_volume"]
