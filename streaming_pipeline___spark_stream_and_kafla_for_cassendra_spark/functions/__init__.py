from .expressions import (
    department_category,
    device_category,
    employee_level,
    is_business_hours,
    session_duration_category,
)

__all__ = [
    "department_category",
    "device_category",
    "employee_level",
    "is_business_hours",
    "session_duration_category",
]
