from nerf_tpu.models.encoding import positional_encoding
from nerf_tpu.models.nerf import NeRFModel
from nerf_tpu.models.siren import SirenModel
from nerf_tpu.models.gabor import GaborModel
from nerf_tpu.models.kilonerf import KiloNeRFModel
from nerf_tpu.models.fastnerf import FastNeRFModel
from nerf_tpu.models.plenoxels import PlenoxelsModel
from nerf_tpu.models.ngp import NGPModel
from nerf_tpu.models.plenoctree import PlenOctreeModel
from nerf_tpu.models.registry import create_model, MODEL_REGISTRY

__all__ = [
    "positional_encoding",
    "NeRFModel",
    "SirenModel",
    "GaborModel",
    "KiloNeRFModel",
    "FastNeRFModel",
    "PlenoxelsModel",
    "NGPModel",
    "PlenOctreeModel",
    "create_model",
    "MODEL_REGISTRY",
]
