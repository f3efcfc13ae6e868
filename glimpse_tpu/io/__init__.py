"""Host-side I/O feeders: GDAL-free raster/image codecs feeding device buffers."""
from . import geotiff  # noqa: F401
