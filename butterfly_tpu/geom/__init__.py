from butterfly_tpu.geom.bbox import Bbox
from butterfly_tpu.geom.circle import Circle, circles_are_separated
from butterfly_tpu.geom.ellipse import Ellipse
from butterfly_tpu.geom.points import (
    as_points,
    bounding_box,
    insert_points_sorted,
    pairwise_dists,
)
from butterfly_tpu.geom.poisson_disk import sample_poisson_disk

__all__ = [
    "Bbox",
    "Circle",
    "circles_are_separated",
    "Ellipse",
    "as_points",
    "bounding_box",
    "insert_points_sorted",
    "pairwise_dists",
    "sample_poisson_disk",
]
