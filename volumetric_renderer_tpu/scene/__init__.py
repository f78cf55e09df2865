from volumetric_renderer_tpu.scene.camera import OrbitCamera, ray_grid

__all__ = ["OrbitCamera", "ray_grid"]
