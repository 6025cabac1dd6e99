from agentic_etl_poc_spark.plans.model import Plan, plan_from_dict  # noqa: F401
from agentic_etl_poc_spark.plans.parser import infer_kind, looks_like_plan, parse_plan  # noqa: F401
