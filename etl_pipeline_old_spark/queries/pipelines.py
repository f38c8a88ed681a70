"""Registry entries for the end-to-end pipelines (plans/pipelines.py)."""

from __future__ import annotations

from ..plans import pipelines as P
from ..registry import register

register(
    "pipeline_logs",
    oracle=P.LOGS_PIPELINE_ORACLE,
    doc=P.logs_pipeline.__doc__,
)(P.logs_pipeline)
