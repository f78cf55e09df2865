"""TPU Pallas kernels.

``slab`` is the production renderer core: the slab-streaming MXU
ray-march kernel (see its module docstring for the design).  It is what
``render.api.render(method="slab")`` and the benchmarks run.
"""

from volumetric_renderer_tpu.kernels.slab import (  # noqa: F401
    build_slabs,
    choose_axis,
    choose_axis_from_camera,
    make_slab_bwd,
    make_slab_marcher,
    make_slab_renderer,
)
