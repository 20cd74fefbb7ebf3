from .health_pipeline import (  # noqa: F401
    enriched_events,
    enriched_events_flagged,
    filtered_enriched_events,
    heartbeat_alerts,
    run_pipeline,
)
