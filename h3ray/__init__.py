"""h3ray: a Ray-Data-native H3 spatial-join + tiling engine.

Pure NumPy H3 kernels (h3ray.kernels) + Ray Data pipeline stages
(h3ray.ops, h3ray.pipelines). Library code never calls ray.init().
"""

__version__ = "0.1.0"
