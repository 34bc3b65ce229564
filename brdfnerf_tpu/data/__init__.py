from .batcher import RayBatcher
from .blender import BlenderDataset
from .factory import load_dataset

__all__ = ["RayBatcher", "BlenderDataset", "load_dataset"]
