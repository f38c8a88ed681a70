"""Registry entries for the remaining reference pipelines
(plans/pipelines2.py)."""

from __future__ import annotations

from ..plans import pipelines2 as P2
from ..registry import register
from .workdays import DURATION_EXPR, WORKDAYS_CTE

register(
    "pipeline_projectsync",
    oracle=P2.PROJECTSYNC_ORACLE,
    doc=P2.projectsync_pipeline.__doc__,
)(P2.projectsync_pipeline)

register(
    "pipeline_gitlab_lines",
    oracle=P2.GITLAB_ORACLE,
    doc=P2.gitlab_lines_pipeline.__doc__,
)(P2.gitlab_lines_pipeline)

_YOUGILE_ORACLE = f"""
WITH {WORKDAYS_CTE},
tasks AS (
  SELECT event_id, createdAt,
         {DURATION_EXPR} AS work_days_duration
  FROM j)
SELECT CASE WHEN work_days_duration IS NULL THEN 'В работе' ELSE 'Закрыта' END AS status,
       strftime(createdAt + INTERVAL 5 HOUR, '%Y-%m-%d') AS created_day,
       count(*) AS n_tasks,
       round(sum(COALESCE(work_days_duration, 0.0)), 2) AS total_days
FROM tasks
GROUP BY 1, 2
"""

register(
    "pipeline_yougile",
    oracle=_YOUGILE_ORACLE,
    doc=P2.yougile_pipeline.__doc__,
)(P2.yougile_pipeline)

register(
    "pipeline_scripts",
    oracle=P2.SCRIPTS_ORACLE,
    doc=P2.scripts_pipeline.__doc__,
)(P2.scripts_pipeline)
