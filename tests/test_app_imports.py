"""Every sample app must import cleanly and expose main() — catches bit-rot
across the acceptance suite without rendering each one."""
import importlib

import pytest

APPS = [
    "hello", "triangle", "sphere", "whitted", "pathtracer", "meshviewer",
    "raycasting", "cutouts", "console", "dynamic_geometry",
    "dynamic_materials", "multigpu", "denoiser", "curves", "hair", "ribbons",
    "simple_motion_blur", "motion_geometry", "volume_viewer",
    "opacity_micromap", "displaced_micromesh", "viewer", "optical_flow",
    "custom_primitive", "callable_programs", "bound_values",
    "compile_with_tasks", "module_create_abort", "nvlink",
]


@pytest.mark.parametrize("name", APPS)
def test_app_imports_and_has_main(name):
    mod = importlib.import_module(f"optix_raytracer_tpu.apps.{name}")
    assert callable(getattr(mod, "main"))
