from gfxexp_tpu.scene.builder import HostMaterial, SceneBuilder, affine  # noqa: F401
from gfxexp_tpu.scene.loaders import load_obj  # noqa: F401
from gfxexp_tpu.scene.types import SceneData  # noqa: F401
