from pgdvs_tpu.kernels.softsplat import softsplat  # noqa: F401
from pgdvs_tpu.kernels.knn import knn_mean_sq_dist, statistical_outlier_mask  # noqa: F401
from pgdvs_tpu.kernels.point_raster import rasterize_points  # noqa: F401
