"""Structured Streaming surface (SURVEY §2.10, build plan M7).

The reference has no streaming; its closest analog is Firestore
``onSnapshot`` live listeners (admin/page.tsx:148-158,296-325) —
continuous-query UX over a mutating collection. This module is the
north-star extension: watermarked window aggregations and stateful
dedup over the driver's ``events`` table.

The window transforms are written against the unified DataFrame API,
so the same function body serves batch (oracle-checkable against
DuckDB) and streaming (file source + availableNow trigger in tests).
"""

from .windows import (  # noqa: F401
    session_agg,
    sliding_counts,
    tumbling_counts,
    with_event_time,
)
