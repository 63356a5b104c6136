from vectrekker_spark.functions.vector import (
    cosine_sim,
    dot,
    l2_dist,
    l2_normalize,
    norm,
)

__all__ = ["cosine_sim", "dot", "l2_dist", "l2_normalize", "norm"]
