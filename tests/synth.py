"""Compatibility shim: the renderer moved into the package."""

from srba_slam_tpu.utils.synthworld import PlaneScene, smooth_texture  # noqa: F401
