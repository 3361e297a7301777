"""Schema registry (SURVEY.md §1.2 — fixed, explicitly declared).

Re-expresses the reference's hand-declared StructTypes:

* employee / activity payload schemas —
  ``multi_source_streaming_processor.py:49-74``
* Debezium CDC envelope — ``multi_source_streaming_processor.py:106-113``
  (the ``after`` field stays a JSON *string*, re-parsed in a second
  ``from_json`` pass — the reference's two-stage parse)
* earlier-iteration users/orders/products — ``README.md:59-84``
  [documented, file absent from snapshot]
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DecimalType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _f(name: str, dtype) -> StructField:
    return StructField(name, dtype, nullable=True)


# reference: MSP:51-57
EMPLOYEE_SCHEMA = StructType(
    [
        _f("id", IntegerType()),
        _f("name", StringType()),
        _f("email", StringType()),
        _f("department", StringType()),
        _f("created_at", StringType()),  # Debezium serializes timestamps as strings
    ]
)

# reference: MSP:59-72 (INET and UUID ride as strings — SURVEY §1.3)
ACTIVITY_SCHEMA = StructType(
    [
        _f("id", StringType()),
        _f("employee_id", IntegerType()),
        _f("activity_type", StringType()),
        _f("page_url", StringType()),
        _f("duration_seconds", IntegerType()),
        _f("ip_address", StringType()),
        _f("user_agent", StringType()),
        _f("activity_timestamp", StringType()),
        _f("session_id", StringType()),
        _f("device_type", StringType()),
        _f("browser", StringType()),
        _f("created_at", StringType()),
    ]
)

# reference: MSP:106-113 — `after` deliberately kept as a JSON string
DEBEZIUM_ENVELOPE_SCHEMA = StructType(
    [
        _f(
            "payload",
            StructType(
                [
                    _f("before", StringType()),
                    _f("after", StringType()),
                    _f("op", StringType()),
                    _f("ts_ms", LongType()),
                ]
            ),
        )
    ]
)

# earlier-iteration tables — README.md:59-84 [documented, file absent]
USERS_SCHEMA = StructType(
    [
        _f("id", IntegerType()),
        _f("name", StringType()),
        _f("email", StringType()),
        _f("age", IntegerType()),
        _f("created_at", StringType()),
        _f("updated_at", StringType()),
    ]
)

ORDERS_CDC_SCHEMA = StructType(
    [
        _f("id", IntegerType()),
        _f("user_id", IntegerType()),
        _f("product_name", StringType()),
        _f("quantity", IntegerType()),
        _f("price", DecimalType(10, 2)),
        _f("order_date", StringType()),
        _f("status", StringType()),
    ]
)

PRODUCTS_SCHEMA = StructType(
    [
        _f("id", IntegerType()),
        _f("name", StringType()),
        _f("category", StringType()),
        _f("price", DecimalType(10, 2)),
        _f("stock_quantity", IntegerType()),
        _f("created_at", StringType()),
    ]
)

PAYLOAD_SCHEMAS: dict[str, StructType] = {
    "employees": EMPLOYEE_SCHEMA,
    "employee_activities": ACTIVITY_SCHEMA,
    "users": USERS_SCHEMA,
    "orders": ORDERS_CDC_SCHEMA,
    "products": PRODUCTS_SCHEMA,
}
