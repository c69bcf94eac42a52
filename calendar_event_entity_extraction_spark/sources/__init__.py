from .manifest import read_manifest, stage_is_complete, write_manifest  # noqa: F401
from .tables import read_table, read_transcripts  # noqa: F401
