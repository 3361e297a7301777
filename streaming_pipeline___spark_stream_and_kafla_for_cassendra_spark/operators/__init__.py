from .enrich import enrich_activities, enrich_employees
from .aggregates import daily_activity_aggregation, hourly_activity_aggregation

__all__ = [
    "enrich_activities",
    "enrich_employees",
    "daily_activity_aggregation",
    "hourly_activity_aggregation",
]
