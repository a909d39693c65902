from kin_data_pipeline_spark.plans.model import Model, model  # noqa: F401
from kin_data_pipeline_spark.plans.engine import Catalog, Runner  # noqa: F401
