from kin_data_pipeline_spark.models import kin  # noqa: F401
