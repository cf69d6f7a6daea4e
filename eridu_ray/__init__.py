"""eridu_ray — a Ray-Data-native near-duplicate detection & clustering engine.

Brand-new implementation of the computational semantics of Graphlet-AI/eridu
(reference at /root/reference, see SURVEY.md) re-expressed Ray-Data-first:
``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy Arrow
batches, actor pools for stateful stages, explicit ``groupby`` shuffles with
salted keys, and iterative label-propagation connected components.
"""

from eridu_ray.config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
