"""CDC core: change-event envelope, filters, projections, DDL evolution.

Re-expresses the reference engine's data plane (SURVEY.md §2.1
operators F1-F3, P1-P5, S3) on DataFrame primitives.
"""

from galaxy_spark.cdc.envelope import (  # noqa: F401
    MQ_EVENT_SCHEMA,
    envelope_from_events,
)
from galaxy_spark.cdc.filters import TaskFilter  # noqa: F401
from galaxy_spark.cdc.projections import (  # noqa: F401
    project_changes,
    route_actions,
)
