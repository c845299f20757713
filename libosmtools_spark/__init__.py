"""libosmtools_spark — PySpark-native spatial-join + tiling engine.

Public convenience surface; operator modules are imported directly
(joins.spatial, joins.mapjoin, index.grid, cells.*, dedup.dedup, sim.ann,
text.analysis, knn.ring, tiles.materialize, streaming.geostream).
"""

from libosmtools_spark.session import (  # noqa: F401
    get_spark,
    stop_spark,
    clear_session_caches,
    register_session_cache,
    release_local_checkpoint,
)
