"""Plan introspection and scale auditing for engine queries."""

from .audit import PlanAudit, audit, formatted_plan  # noqa: F401
