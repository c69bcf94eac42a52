from .canonicalize import canonicalize_events  # noqa: F401
from .extract import extract_events  # noqa: F401
from .triples import events_to_triples  # noqa: F401
