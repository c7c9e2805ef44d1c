from geocube_spark.plans.find_datasets import DatasetFilters, find_datasets  # noqa: F401
from geocube_spark.plans.find_records import RecordFilters, find_records  # noqa: F401
