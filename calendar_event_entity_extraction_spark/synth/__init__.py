from .grammar import event_spec, turns_for_key  # noqa: F401
from .transcripts import gold_events, keys_df, transcripts_from_keys  # noqa: F401
