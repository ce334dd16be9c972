"""Pipeline orchestration + physical-plan auditing (SURVEY.md §7 M8).

The reference's character was a *pipeline* tool (fetch → munge → cache
stages chained in a console session); ``Pipeline`` is that workflow as a
declarative DAG over DataFrame thunks. ``audit`` makes the engine's
plan-inspection discipline (pushdown? broadcast? codegen?) programmatic.
"""

from hawaiidatapipeline_spark.plans.pipeline import Pipeline
from hawaiidatapipeline_spark.plans import audit

__all__ = ["Pipeline", "audit"]
