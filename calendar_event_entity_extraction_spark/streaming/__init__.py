from .extract_stream import streaming_extract, windowed_event_counts  # noqa: F401
