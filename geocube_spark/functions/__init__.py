from geocube_spark.functions.globs import glob_to_like, like_filter  # noqa: F401
from geocube_spark.functions.dataformat import cast_expr, map_to_external_expr  # noqa: F401
